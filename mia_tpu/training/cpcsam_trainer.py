"""Semi-supervised Cross-Prompting-Consistency SAM trainer (reference
``src/training/cpcsam_trainer.py:254-1530``).

Functional core: the whole 3-loss composition — round-1 unprompted
dual-decoder supervision, round-2 per-decoder prompt-driven
cross-consistency (device-side prompt generation), optional prototype
contrastive loss with a functional feature-memory state, optional VAT — is
jitted as TWO programs (pre-/post-``warmup_iter``), selected on the host by
iteration. LoRA freezing is an optax mask; the LoRA-style checkpoint
(adapters + everything outside the frozen ViT) matches
``sam_lora_image_encoder.py:107-207``.
"""

from __future__ import annotations

import json
import time
from datetime import datetime
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import serialization

from ..data import ACDCDataset, BatchLoader, TwoStreamBatchSampler
from ..losses import DiceAndCELoss, prototype_contrastive_loss, vat_loss
from ..memories import FeatureMemoryState, init_feature_memory, update_feature_memory
from ..models.sam import (
    SamDualmask,
    freeze_wrt_mask,
    import_torch_sam_encoder,
    load_lora_bytes,
    lora_trainable_mask,
    sam_model_registry,
    save_lora_bytes,
)
from ..models.sam.prompt_generation import prompt_generate_random_fast
from ..models.sam.validation import test_single_volume, test_single_volume_mean
from ..schedule import poly_warmup_schedule, sigmoid_ramp_up
from ..utils.common import get_path
from ..utils.compile_cache import maybe_enable_compilation_cache
from ..utils.logging import setup_logger
from .al_config import ALConfig  # noqa: F401  (shared JSON conventions)
from .base_trainer import BaseTrainer
from .state import make_optimizer


class CPCSAMConfig:
    """Auto-capturing config (reference ``cpcsam_trainer.py:69-246``)."""

    def __init__(
        self,
        seed: int = 12345,
        # Model parameters
        in_channels: int = 3,
        num_classes: int = 3,
        patch_size=None,
        image_size=512,
        sam_name: str = "vit_b_dualmask_same_prompt_class_random_large",
        model_ckpt=None,
        lora_rank: int = 4,
        lora_ckpt=None,
        promptmode=("point",),
        dropout_rate: float = 0.0,
        num_points_prompt=(1, 2),
        bbox_change_rate=(0.1, 0.2),
        prompt_compute_size: int = 64,
        compute_dtype: str = "float32",
        # Data parameters
        dataset: str = "ACDC",
        data_path="data",
        labeled_ratio: float = 1.0,
        labeled_num: int | None = 1,
        do_augment: bool = False,
        do_normalize: bool = False,
        batch_size: int = 32,
        labeled_batch_ratio: float = 0.5,
        num_workers: int = 1,
        pin_memory: bool = True,
        # Training parameters
        optimizer_name: str = "adamw",
        optimizer_kwargs: dict | None = None,
        num_epochs: int = 10000,
        min_iter: int = 10000,
        max_iter: int | None = None,
        warmup_iter: int = 5000,
        start_lr: float = 1e-3,
        lr_scheduler_name: str = "poly",
        lr_warmup_iter: int = 5000,
        save_freq_epoch: int = 100,
        valid_freq_iter: int = 200,
        log_every_iters: int = 1,
        save_metric_name: str = "dice",
        maximum_save_metric: bool | None = None,
        loss_name: str = "dice+ce",
        dice_weight: float = 0.8,
        loss2_weight: float = 1.0,
        loss2_weight_rampup_interval: int = 100,
        loss2_weight_rampup_iter: int = 0,
        consistency_weight_1: float = 0.4,
        consistency_weight_2: float = 0.05,
        early_stop_max_patience: int | None = None,
        loss3_weight: float = 0.1,
        loss3_weight_rampup_interval: int = 100,
        loss3_weight_rampup_iter: int = 15000,
        use_contrastive_loss: bool = False,
        contrastive_dropout_rate: float = 0.0,
        contrastive_weight: float = 0.1,
        use_adv_loss: bool = False,
        adv_weight: float = 1.0,
        adv_loss_kwargs: dict | None = None,
        # trace the phase-1 (and phase-2 first-pass) model on the labeled
        # slice only — identical loss/grad math, ~1/ratio fewer FLOPs
        # (False restores the reference-shaped full-batch program)
        phase1_labeled_only: bool = True,
        stride=None,
        exp_name: str = "",
        **kwargs,
    ):
        self._config_dict = {}
        self.seed = seed
        self.in_channels = in_channels
        self.num_classes = num_classes
        self.patch_size = patch_size
        self.image_size = (
            image_size if not isinstance(image_size, (list, tuple)) else image_size[0]
        )
        self.sam_name = sam_name
        self.model_ckpt = model_ckpt
        self.lora_rank = lora_rank
        self.lora_ckpt = lora_ckpt
        self.promptmode = list(promptmode)
        self.dropout_rate = dropout_rate
        self.num_points_prompt = tuple(num_points_prompt)
        self.bbox_change_rate = tuple(bbox_change_rate)
        # resolution cap for the phase-2 CC/EDT prompt machinery (positions
        # are random-jittered anyway; compute_at_native=0 disables the cap)
        self.prompt_compute_size = prompt_compute_size
        self.compute_dtype = compute_dtype

        self.dataset = dataset
        self.data_path = data_path
        self.labeled_ratio = labeled_ratio
        self.labeled_num = labeled_num
        self.do_augment = do_augment
        self.do_normalize = do_normalize
        self.batch_size = batch_size
        self.labeled_batch_size = round(batch_size * labeled_batch_ratio)
        self.num_workers = num_workers
        self.pin_memory = pin_memory

        self.optimizer_name = optimizer_name
        self.optimizer_kwargs = optimizer_kwargs or {}
        self.num_epochs = num_epochs
        self.min_iter = min_iter
        self.max_iter = max_iter if max_iter is not None else min_iter
        self.warmup_iter = warmup_iter
        self.start_lr = start_lr
        self.lr_scheduler_name = lr_scheduler_name
        self.lr_warmup_iter = lr_warmup_iter
        self.save_freq_epoch = save_freq_epoch
        self.valid_freq_iter = valid_freq_iter
        self.log_every_iters = log_every_iters
        self.save_metric_name = save_metric_name
        self.maximum_save_metric = maximum_save_metric
        self.loss_name = loss_name
        self.dice_weight = dice_weight
        self.loss2_weight = loss2_weight
        self.loss2_weight_rampup_interval = loss2_weight_rampup_interval
        self.loss2_weight_rampup_iter = loss2_weight_rampup_iter
        self.consistency_weight_1 = consistency_weight_1
        self.consistency_weight_2 = consistency_weight_2
        self.early_stop_max_patience = early_stop_max_patience
        self.loss3_weight = loss3_weight
        self.loss3_weight_rampup_interval = loss3_weight_rampup_interval
        self.loss3_weight_rampup_iter = loss3_weight_rampup_iter
        self.use_contrastive_loss = use_contrastive_loss
        self.contrastive_dropout_rate = contrastive_dropout_rate
        self.contrastive_weight = contrastive_weight
        self.use_adv_loss = use_adv_loss
        self.adv_weight = adv_weight
        self.adv_loss_kwargs = adv_loss_kwargs or {"xi": 10.0, "epi": 6.0, "ip": 1}
        self.phase1_labeled_only = phase1_labeled_only
        self.stride = stride
        self.exp_name = exp_name

    def __setattr__(self, name, value):
        if hasattr(self, "_config_dict"):
            self._config_dict[name] = value
        super().__setattr__(name, value)

    def save(self, save_path):
        save_path = Path(save_path)
        save_path.parent.mkdir(parents=True, exist_ok=True)
        serializable = {
            k: (str(v) if isinstance(v, Path) else v)
            for k, v in self._config_dict.items()
        }
        save_path.write_text(json.dumps(serializable, indent=2))

    def load(self, save_path):
        for k, v in json.loads(Path(save_path).read_text()).items():
            setattr(self, k, v)
        return self


# ACDC labeled-patients → slice-count table (cpcsam_trainer.py:487-502)
PATIENTS_TO_SLICES = {
    "ACDC": {
        "1": 32, "3": 68, "7": 136, "14": 256, "21": 396,
        "28": 512, "35": 664, "140": 1312,
    }
}


def patients_to_slices(dataset: str, patients_num) -> int:
    return PATIENTS_TO_SLICES[dataset][str(patients_num)]


class CPCSAMTrainer(BaseTrainer):
    def __init__(
        self,
        work_path=Path.cwd(),
        device=None,
        config=None,
        resume=None,
        verbose: bool = True,
        log_path=None,
        config_path=None,
        log_mode="a",
        log_override=False,
        use_wandb=False,
        wandb_api_key=None,
        mesh=None,
        **kwargs,
    ):
        if isinstance(config, CPCSAMConfig):
            self.config = config
        elif isinstance(config, dict):
            self.config = CPCSAMConfig(**config)
        elif isinstance(config, (str, Path)):
            self.config = CPCSAMConfig().load(config)
        else:
            self.config = CPCSAMConfig()

        self.work_path = get_path(work_path)
        self.resume = resume
        self.verbose = verbose
        self.log_path = log_path
        self.config_path = config_path
        self.log_mode = log_mode
        self.log_override = log_override
        try:
            import wandb as _wandb  # noqa: F401

            _has_wandb = True
        except Exception:  # pragma: no cover - wandb absent in this image
            _has_wandb = False
        self.use_wandb = bool(use_wandb) and _has_wandb
        self.wandb_api_key = wandb_api_key
        self.wandb_runner = None  # injected/inited lazily; alerts no-op without it
        self.mesh = mesh
        self.root_key = jax.random.PRNGKey(self.config.seed)
        np.random.seed(self.config.seed)

        self.current_iter = 0
        self.current_epoch = 0
        self.current_patience = 0
        self.params = None
        self._pending_train_logs = []

    # ------------------------------------------------------------------
    def initialize(self):
        maybe_enable_compilation_cache()
        stamp = datetime.now().strftime("%Y%m%d_%H")
        name = "_".join(
            [
                "cpcsam",
                f"{self.config.dataset}",
                stamp,
                f"labeled-{self.config.labeled_num}",
                f"imgsz-{self.config.image_size}",
                f"batchsz-{self.config.batch_size}",
                f"lora-{self.config.lora_rank}",
                f"prompt-{'-'.join(self.config.promptmode)}",
            ]
            + ([self.config.exp_name] if self.config.exp_name else [])
        )
        self.work_path = self.work_path / name
        self.work_path.mkdir(parents=True, exist_ok=True)
        if not self.log_path:
            self.log_path = self.work_path / "log.txt"
        self.logger = setup_logger(
            "MIA.CPCSAMTrainer",
            log_path=self.log_path,
            verbose=self.verbose,
            log_mode=self.log_mode,
            log_override=self.log_override,
        )
        self._build_model()

    def _build_model(self):
        build = sam_model_registry[self.config.sam_name]
        self.model, self.embed_size = build(
            image_size=self.config.image_size,
            num_classes=self.config.num_classes,
            lora_rank=self.config.lora_rank,
            dropout_rate=self.config.dropout_rate,
            num_points_prompt=self.config.num_points_prompt,
            bbox_change_rate=self.config.bbox_change_rate,
            compute_dtype=jnp.bfloat16
            if self.config.compute_dtype == "bfloat16"
            else jnp.float32,
        )
        x = jnp.zeros((1, self.config.image_size, self.config.image_size, 3))
        variables = self.model.init(
            {"params": self.root_key, "prompt": self.root_key, "dropout": self.root_key},
            x, self.config.image_size,
            method=self.model.init_variables,
        )
        self.params = variables["params"]

        if self.config.model_ckpt:
            self.load_model_checkpoint(self.config.model_ckpt)
        if self.config.lora_ckpt:
            self.load_lora_checkpoint(self.config.lora_ckpt)

    # ------------------------------------------------------------------
    # checkpoints
    # ------------------------------------------------------------------
    def load_model_checkpoint(self, ckpt):
        ckpt = Path(ckpt)
        try:
            if ckpt.suffix in (".pth", ".pt"):
                import torch

                sd = torch.load(ckpt, map_location="cpu")
                enc = import_torch_sam_encoder(
                    sd,
                    depth=self.model.encoder_depth,
                    image_size=self.config.image_size,
                    global_attn_indexes=self.model.encoder_global_attn_indexes,
                )
                # graft converted encoder weights, keep LoRA adapters
                base = dict(self.params["image_encoder"])
                for k, v in enc.items():
                    if k.startswith("block"):
                        blk = dict(base[k])
                        attn = dict(blk["attn"])
                        for ak, av in v["attn"].items():
                            attn[ak] = av
                        blk_new = dict(v)
                        blk_new["attn"] = attn
                        base[k] = blk_new
                    else:
                        base[k] = v
                params = dict(self.params)
                params["image_encoder"] = base
                self.params = params
            else:
                if ckpt.is_dir():
                    ckpt = ckpt / "model.msgpack"
                self.params = serialization.from_bytes(self.params, ckpt.read_bytes())
            self.logger.info(f"Loaded model checkpoint from {ckpt}")
        except Exception as e:
            self.logger.warning(f"Failed to load model checkpoint from {ckpt}")
            self.logger.exception(e)

    def load_lora_checkpoint(self, ckpt):
        try:
            self.params = load_lora_bytes(self.params, Path(ckpt).read_bytes())
            self.logger.info(f"Loaded LoRA checkpoint from {ckpt}")
        except Exception as e:
            self.logger.warning(f"Failed to load LoRA checkpoint from {ckpt}")
            self.logger.exception(e)

    def save_state_dict(self, save_path, save_training_state: bool = False):
        save_path = get_path(save_path)
        save_path.mkdir(parents=True, exist_ok=True)
        # LoRA-style: adapters + everything outside the frozen encoder
        (save_path / "lora.msgpack").write_bytes(save_lora_bytes(self.params))
        if save_training_state:
            (save_path / "training_state.json").write_text(
                json.dumps(
                    {
                        "current_iter": self.current_iter,
                        "current_epoch": self.current_epoch,
                    }
                )
            )
        self.logger.info(f'Saved new checkpoint to "{save_path}"')

    def load_state_dict(self, save_path):
        save_path = get_path(save_path)
        lora = save_path / "lora.msgpack"
        if lora.is_file():
            self.load_lora_checkpoint(lora)
        ts = save_path / "training_state.json"
        if ts.is_file():
            state = json.loads(ts.read_text())
            self.current_iter = state["current_iter"] + 1
            self.current_epoch = state["current_epoch"] + 1

    def state_dict(self):
        return {
            "current_iter": self.current_iter,
            "current_epoch": self.current_epoch,
        }

    # ------------------------------------------------------------------
    # data
    # ------------------------------------------------------------------
    def get_data(self):
        train_dataset = ACDCDataset(
            data_path=self.config.data_path,
            split="train",
            image_channels=self.config.in_channels,
        )
        total_slices = len(train_dataset)
        labeled_slices = patients_to_slices("ACDC", self.config.labeled_num)
        sampler_factory = lambda: TwoStreamBatchSampler(
            list(range(0, labeled_slices)),
            list(range(labeled_slices, total_slices)),
            self.config.batch_size,
            self.config.batch_size - self.config.labeled_batch_size,
            seed=self.config.seed + self.current_epoch,
        )
        valid_dataset = ACDCDataset(
            data_path=self.config.data_path,
            split="valid",
            image_channels=self.config.in_channels,
        )
        valid_loader = BatchLoader(
            valid_dataset, batch_size=1, shuffle=False, drop_last=False, device_put=False
        )
        return train_dataset, valid_dataset, sampler_factory, valid_loader

    def _train_loader(self):
        return BatchLoader(
            self.train_dataset,
            batch_size=self.config.batch_size,
            sampler=self._sampler_factory(),
            device_put=False,
        )

    # ------------------------------------------------------------------
    # programs
    # ------------------------------------------------------------------
    def _setup_loss(self):
        if self.config.loss_name != "dice+ce":
            raise ValueError(f"Loss function {self.config.loss_name} not found")
        # CPCSAM convention: loss = (1-w)*CE + w*Dice via per-call weights
        self.supervised_loss = DiceAndCELoss(
            dice_weight=self.config.dice_weight,
            ce_weight=1.0 - self.config.dice_weight,
            smooth=1e-5,
            do_bg=True,
        )
        self.loss2_rampup = sigmoid_ramp_up(
            self.config.loss2_weight,
            self.config.loss2_weight_rampup_iter,
            self.config.loss2_weight_rampup_interval,
        )
        self.loss3_rampup = sigmoid_ramp_up(
            self.config.loss3_weight,
            self.config.loss3_weight_rampup_iter,
            self.config.loss3_weight_rampup_interval,
        )

    def _setup_optimizer(self):
        self.lr_schedule = poly_warmup_schedule(
            self.config.start_lr,
            max_steps=self.config.max_iter,
            warmup_steps=self.config.lr_warmup_iter,
        )
        base = make_optimizer(
            self.config.optimizer_name,
            self.lr_schedule,
            grad_clip=None,
            **self.config.optimizer_kwargs,
        )
        mask = lora_trainable_mask(self.params)
        self.tx = freeze_wrt_mask(base, mask)
        self.opt_state = self.tx.init(self.params)

    def _supervised(self, logits, labels, dice_w):
        """(1-w)*CE + w*Dice, the reference's 3-return call shape."""
        total, ce, dice = self.supervised_loss(
            logits, labels, dice_weight=dice_w, ce_weight=1.0 - dice_w
        )
        return total

    def _make_programs(self):
        model = self.model
        cfg = self.config
        lbs = cfg.labeled_batch_size
        num_decoders = model.num_decoders

        def apply_model(params, images, rng, prompt_idx, image_embeddings=None,
                        prompts=None):
            prompt_rng, drop_rng = jax.random.split(rng)
            return model.apply(
                {"params": params},
                images,
                True,
                cfg.image_size,
                prompt_idx,
                cfg.promptmode if prompt_idx >= 0 else None,
                image_embeddings,
                train=True,
                prompts=prompts,
                rngs={"prompt": prompt_rng, "dropout": drop_rng},
            )

        def batched_prompts(params, image_embeddings, rng):
            """ONE prompt-generation program for ALL decoders (axis n·B).

            The reference regenerates prompts per ``prompt_idx`` from the
            ensemble of the OTHER decoders (three separate CC/EDT programs
            per step, ``sam_dualmask...py:508-645``); the per-idx ensembles
            are all derivable from the n raw softmaxes, so the CC while-loop
            sweeps — the dominant phase-2 cost — run once over a 3× batch
            instead of three times sequentially."""
            n = num_decoders
            raws = head(params, "raw_decoder_softmaxes", image_embeddings)
            total_soft = jnp.sum(raws, axis=0)
            assembles = jnp.stack(
                [(total_soft - raws[p]) / (n - 1) for p in range(n)]
            )  # (n, B, H, W, C)
            nb = assembles.shape[0] * assembles.shape[1]
            flat = assembles.reshape((nb,) + assembles.shape[2:])
            emb = model.img_size // 16
            prompts_flat = prompt_generate_random_fast(
                rng,
                flat,
                cfg.image_size,
                (emb * 4, emb * 4),
                cfg.num_points_prompt,
                cfg.bbox_change_rate,
                israndom=True,
                compute_at_native=cfg.prompt_compute_size <= 0,
                max_compute_size=cfg.prompt_compute_size or 128,
            )

            def unstack(p):
                def split(t):
                    return t.reshape((n, -1) + t.shape[1:])[p]

                return jax.tree.map(split, prompts_flat)

            return [unstack(p) for p in range(n)]

        use_tp = (
            self.mesh is not None
            and "model" in self.mesh.axis_names
            and self.mesh.shape["model"] > 1
        )
        if use_tp:
            # tensor-parallel encoder: the ViT (the FLOPs bulk of every
            # phase, SURVEY §3.3) runs Megatron-style over the mesh's
            # "model" axis via shard_map (mia_tpu.parallel.tp); decoders /
            # prompt gen stay batch-sharded GSPMD. Params enter replicated
            # — the shard_map in_specs slice them locally (no comm) — and
            # the LoRA cotangents flow back through the shard_map
            # transpose, so the masked optimizer is unchanged.
            from ..models.sam.sam import build_image_encoder, preprocess_image
            from ..parallel import make_tp_encoder_forward, prepare_tp_params

            enc_mod = build_image_encoder(model)
            tp_fwd = make_tp_encoder_forward(enc_mod, self.mesh)

            def embed(params, images):
                x = preprocess_image(images, model.img_size)
                prepared = prepare_tp_params(
                    params["image_encoder"], enc_mod.num_heads
                )
                return tp_fwd(prepared, x)

        else:

            def embed(params, images):
                return model.apply(
                    {"params": params},
                    images,
                    method=model.get_image_embeddings,
                )

        def head(params, method_name, *args):
            return model.apply(
                {"params": params}, *args, method=getattr(model, method_name)
            )

        def contrastive_terms(params, memory, feats, preds_or_labels, retain_rng):
            """Project/predict/select + loss for one feature group."""
            n = feats.shape[0]
            retain = jax.random.bernoulli(
                retain_rng, 1.0 - cfg.contrastive_dropout_rate, (n,)
            )
            proj = head(params, "project_features", feats, retain)
            pred_f = head(params, "predict_features", proj, retain)
            sel = jnp.stack(
                [
                    head(
                        params, "select_features", c,
                        jax.lax.stop_gradient(pred_f), retain, False,
                    )[:, 0]
                    for c in range(cfg.num_classes + 1)
                ]
            )
            sel_mem = jnp.stack(
                [
                    head(
                        params, "select_features", c, memory.bank[c],
                        memory.valid[c], True,
                    )[:, 0]
                    for c in range(cfg.num_classes + 1)
                ]
            )
            return prototype_contrastive_loss(
                pred_f, preds_or_labels, retain, memory, sel, sel_mem, cfg.num_classes
            )

        def losses_fn(params, memory, images, labels, rng, step, phase2: bool):
            rngs = jax.random.split(rng, 9)
            # Phase-1 consumes ONLY the labeled slice: loss1 reads
            # low_res_logits[:lbs] and (with aux losses off) nothing reads
            # the unlabeled half — but XLA cannot dead-code-eliminate a
            # batch SLICE out of the encoder/decoder matmuls, so the
            # reference-shaped full-batch program computes and discards
            # ~(1-ratio) of its FLOPs every phase-1 step (the reference
            # does exactly this waste, ``cpcsam_trainer.py:1099-1121``).
            # Tracing the phase-1 program on images[:lbs] is mathematically
            # identical (LayerNorm + per-sample dropout: no cross-batch
            # coupling) and removes the dead compute at trace time. The
            # same applies to phase-2's FIRST (unprompted) pass — only its
            # labeled rows are consumed — while its embeddings stay
            # full-batch for prompt generation and the prompted passes.
            aux_on = cfg.use_contrastive_loss or cfg.use_adv_loss
            slice_p1 = cfg.phase1_labeled_only and not aux_on
            if phase2 or not slice_p1:
                image_embeddings = embed(params, images)
            else:
                image_embeddings = embed(params, images[:lbs])
            if phase2 and slice_p1:
                outputs = apply_model(
                    params, images[:lbs], rngs[0], -1, image_embeddings[:lbs]
                )
            elif not phase2 and slice_p1:
                outputs = apply_model(
                    params, images[:lbs], rngs[0], -1, image_embeddings
                )
            else:
                outputs = apply_model(params, images, rngs[0], -1, image_embeddings)

            labeled_labels = labels[:lbs]
            loss1 = 0.0
            feats_labeled, preds_labeled = [], []
            feats_unlabeled, preds_unlabeled = [], []
            for i in range(num_decoders):
                lrl = outputs["low_res_logits"][i]
                loss1 = loss1 + self._supervised(lrl[:lbs], labeled_labels, cfg.dice_weight)
                if cfg.use_contrastive_loss:
                    soft = jax.nn.softmax(outputs["masks"][i].astype(jnp.float32), -1)
                    feats_labeled.append(outputs["dense_features"][i][:lbs])
                    preds_labeled.append(jnp.argmax(soft[:lbs], -1))
                    feats_unlabeled.append(outputs["dense_features"][i][lbs:])
                    preds_unlabeled.append(jnp.argmax(soft[lbs:], -1))

            loss2 = 0.0
            if phase2:
                sup2 = sup2_r = cons2 = cons2_r = 0.0
                all_prompts = batched_prompts(params, image_embeddings, rngs[8])
                for prompt_idx in range(num_decoders):
                    out2 = apply_model(
                        params, images, rngs[1 + prompt_idx], prompt_idx,
                        image_embeddings, prompts=all_prompts[prompt_idx],
                    )
                    lrl_p = out2["low_res_logits"][prompt_idx]
                    lrl_pr = out2["low_res_logits_r"][prompt_idx]
                    if cfg.use_contrastive_loss:
                        feats_labeled.append(out2["dense_features"][prompt_idx][:lbs])
                        preds_labeled.append(
                            jnp.argmax(jax.nn.softmax(lrl_p[:lbs].astype(jnp.float32), -1), -1)
                        )
                        feats_unlabeled.append(out2["dense_features"][prompt_idx][lbs:])
                        preds_unlabeled.append(
                            jnp.argmax(jax.nn.softmax(lrl_p[lbs:].astype(jnp.float32), -1), -1)
                        )

                    sup2 = sup2 + self._supervised(lrl_p[:lbs], labeled_labels, cfg.dice_weight)
                    sup2_r = sup2_r + self._supervised(
                        lrl_pr[:lbs], labeled_labels, cfg.dice_weight
                    )

                    ens = (
                        jax.nn.softmax(lrl_p.astype(jnp.float32), -1)
                        + jax.nn.softmax(lrl_pr.astype(jnp.float32), -1)
                    ) / 2.0
                    pseudo = jax.lax.stop_gradient(jnp.argmax(ens[lbs:], -1))
                    for other in range(num_decoders):
                        if other != prompt_idx:
                            cons2 = cons2 + self._supervised(
                                out2["low_res_logits"][other][lbs:], pseudo, 0.5
                            )
                    cons2_r = cons2_r + self._supervised(lrl_pr[lbs:], pseudo, 0.5)

                loss2 = (
                    sup2
                    + sup2_r
                    + cfg.consistency_weight_1 * cons2
                    + cfg.consistency_weight_2 * cons2_r
                )

            loss3 = 0.0
            new_memory = memory
            if cfg.use_contrastive_loss:
                dim = feats_labeled[0].shape[-1]
                fl = jnp.concatenate([f.reshape(-1, dim) for f in feats_labeled])
                pl = jnp.concatenate([p.reshape(-1) for p in preds_labeled])
                fu = jnp.concatenate([f.reshape(-1, dim) for f in feats_unlabeled])
                pu = jnp.concatenate([p.reshape(-1) for p in preds_unlabeled])
                ll = jnp.concatenate(
                    [labeled_labels.reshape(-1)] * len(feats_labeled)
                )

                # memory update on correct labeled predictions (no grad)
                correct = (pl == ll) & (pl > 0)
                flx = jax.lax.stop_gradient(fl)
                proj_corr = head(params, "project_features", flx, correct)
                scores = jnp.stack(
                    [
                        head(params, "select_features", c, proj_corr, correct, False)[:, 0]
                        for c in range(cfg.num_classes + 1)
                    ]
                )
                scores = jax.nn.sigmoid(jax.lax.stop_gradient(scores))
                mem_labels = jnp.where(correct, ll, -1)
                new_memory = update_feature_memory(
                    memory, jax.lax.stop_gradient(proj_corr), mem_labels, scores
                )

                c1 = contrastive_terms(params, new_memory, fl, ll, rngs[4])
                c2 = contrastive_terms(params, new_memory, fu, pu, rngs[5])
                loss3 = cfg.contrastive_weight * (c1 + c2)

            if cfg.use_adv_loss:
                def fwd(emb):
                    out = apply_model(params, images, rngs[6], -1, emb)
                    return out["low_res_logits"]

                adv = vat_loss(
                    rngs[7],
                    fwd,
                    image_embeddings,
                    clean_logits_list=[
                        jax.lax.stop_gradient(m) for m in outputs["low_res_logits"]
                    ],
                    **cfg.adv_loss_kwargs,
                )
                loss3 = loss3 + cfg.adv_weight * adv

            w2 = self.loss2_rampup(step)
            w3 = self.loss3_rampup(step)
            total = loss1 + w2 * loss2 + w3 * loss3
            return total, (loss1, loss2, loss3, new_memory)

        def make_step(phase2: bool):
            def step_fn(params, opt_state, memory, images, labels, rng, step):
                (total, (l1, l2, l3, new_memory)), grads = jax.value_and_grad(
                    losses_fn, has_aux=True
                )(params, memory, images, labels, rng, step, phase2)
                updates, new_opt_state = self.tx.update(grads, opt_state, params)
                new_params = optax.apply_updates(params, updates)
                metrics = {
                    "loss": total,
                    "loss1": l1,
                    "loss2": l2,
                    "loss3": l3,
                    "lr": self.lr_schedule(step),
                }
                return new_params, new_opt_state, new_memory, metrics

            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                repl = NamedSharding(self.mesh, P())
                data = NamedSharding(self.mesh, P("data"))
                return jax.jit(
                    step_fn,
                    in_shardings=(repl, repl, repl, data, data, repl, repl),
                    out_shardings=(repl, repl, repl, repl),
                    donate_argnums=(0, 1),
                )
            return jax.jit(step_fn, donate_argnums=(0, 1))

        self._step_phase1 = make_step(False)
        self._step_phase2 = make_step(True)

        def eval_fwd_fn(params, images):
            # jitted valid/test forward (params as an argument so every
            # valid step reuses one compilation; the former closure-based
            # version dispatched the whole model op-by-op)
            return model.apply(
                {"params": params},
                images,
                True,
                cfg.image_size,
                -1,
                None,
                rngs={"prompt": jax.random.PRNGKey(0)},
            )

        if self.mesh is not None:
            # mesh eval: the volume's slice stack shards over the data axis
            # (the reference's own batching trick scaled across chips,
            # ``validation.py:29-79``); _forward_volume pads depth to the
            # axis size via ``depth_multiple`` (self._eval_depth_multiple)
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(self.mesh, P())
            data = NamedSharding(self.mesh, P("data"))
            eval_fwd = jax.jit(
                eval_fwd_fn, in_shardings=(repl, data), out_shardings=repl
            )
            self._eval_depth_multiple = int(self.mesh.shape["data"])
        else:
            eval_fwd = jax.jit(eval_fwd_fn)
            self._eval_depth_multiple = 1

        def eval_apply(params):
            return lambda images: eval_fwd(params, images)

        self._eval_apply = eval_apply

    # ------------------------------------------------------------------
    # lifecycle
    # ------------------------------------------------------------------
    def on_train_start(self):
        (
            self.train_dataset,
            self.valid_dataset,
            self._sampler_factory,
            self.valid_dataloader,
        ) = self.get_data()

        self._setup_loss()
        self._setup_optimizer()
        self._make_programs()

        dim_in = 256 // 16
        self.memory = init_feature_memory(self.config.num_classes, 2 * dim_in)

        if self.config.maximum_save_metric is None:
            self.config.maximum_save_metric = self.config.save_metric_name == "dice"
        default = -np.inf if self.config.maximum_save_metric else np.inf
        self._best_valid_metric = default
        self._cur_valid_metric = default

        if self.resume is not None:
            self.load_state_dict(self.resume)

        self.config.save(self.work_path / "config.json")

    def train_step(self, sampled_batch):
        start = time.time()
        self.logger.info(f"Iteration {self.current_iter}:")
        images = jnp.asarray(sampled_batch["image"], jnp.float32)
        labels = jnp.asarray(sampled_batch["label"], jnp.int32)

        step_fn = (
            self._step_phase2
            if self.current_iter >= self.config.warmup_iter
            else self._step_phase1
        )
        rng = jax.random.fold_in(self.root_key, self.current_iter)
        self.params, self.opt_state, self.memory, metrics = step_fn(
            self.params, self.opt_state, self.memory, images, labels, rng,
            jnp.asarray(self.current_iter),
        )
        log_every = max(1, int(getattr(self.config, "log_every_iters", 1)))
        self._pending_train_logs.append((self.current_iter, metrics))
        if log_every <= 1:
            # per-iteration cadence with a ONE-iteration lag (same scheme
            # as ALTrainer.train_step): async-copy THIS step's scalars,
            # emit step i−1's line — its copies had a whole device step to
            # land, so the fetch no longer serializes dispatch against the
            # device (reference cadence: cpcsam_trainer.py:1300-1315)
            for k in ("loss", "loss1", "loss2", "loss3", "lr"):
                metrics[k].copy_to_host_async()
            if len(self._pending_train_logs) > 1:
                p_iter, p_metrics = self._pending_train_logs.pop(0)
                vals = [
                    float(np.asarray(p_metrics[k]))
                    for k in ("loss", "loss1", "loss2", "loss3", "lr")
                ]
                losses = vals[:4]
                self.logger.info(
                    f"Iteration {p_iter} lr: {vals[4]} Loss: {losses}"
                )
                self.epoch_train_outputs.append({"loss": losses})
        elif (self.current_iter + 1) % log_every == 0:
            # windowed deferral: flush every log_every steps
            self._flush_train_logs()
        self.logger.info(
            f"Iteration time elapsed: {time.time() - start:.3f} seconds"
        )
        self.logger.info("")
        self.current_iter += 1

    def _flush_train_logs(self):
        """Fetch buffered device metric scalars (one host sync for the whole
        window) and emit the deferred log records."""
        if not getattr(self, "_pending_train_logs", None):
            return
        pending, self._pending_train_logs = self._pending_train_logs, []
        keys = ("loss", "loss1", "loss2", "loss3", "lr")
        flat = jax.device_get([[m[k] for k in keys] for _, m in pending])
        for (step_idx, _), vals in zip(pending, flat):
            losses = [float(v) for v in vals[:4]]
            self.logger.info(
                f"Iteration {step_idx} lr: {float(vals[4])} Loss: {losses}"
            )
            self.epoch_train_outputs.append({"loss": losses})

    def valid_step(self, sampled_batch):
        # defer=True: metrics/loss stay ON device — per-case dispatch runs
        # ahead of the tunnel; on_valid_epoch_end fetches the whole epoch
        # in one device_get (same pattern as the AL trainer's valid path)
        metric_dev, loss_dev = test_single_volume(
            sampled_batch["image"],
            sampled_batch["label"],
            self._eval_apply(self.params),
            classes=self.config.num_classes + 1,
            patch_size=(self.config.image_size, self.config.image_size),
            loss_fn=self.supervised_loss,
            defer=True,
            depth_multiple=getattr(self, "_eval_depth_multiple", 1),
        )
        self.epoch_valid_outputs.append({"metric": metric_dev, "loss": loss_dev})

    def on_valid_epoch_end(self):
        import warnings

        # ONE fetch for the whole deferred epoch
        self.epoch_valid_outputs = jax.device_get(self.epoch_valid_outputs)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            per_cls = np.nanmean(
                np.stack([o["metric"] for o in self.epoch_valid_outputs]), axis=0
            )
            avg_dsc = float(np.nanmean(per_cls[:, 0]))
            avg_hd95 = float(np.nanmean(per_cls[:, 1]))
        self.logger.info("Valid results (DSC, HD95):")
        self.logger.info(f"  per-class: {per_cls.tolist()}")
        self.logger.info(f"  mean dsc: {avg_dsc} hd95: {avg_hd95}")

        if self.config.save_metric_name == "dice":
            self._cur_valid_metric = avg_dsc
        elif self.config.save_metric_name == "hd":
            self._cur_valid_metric = avg_hd95

        improved = (
            self._cur_valid_metric > self._best_valid_metric
            if self.config.maximum_save_metric
            else self._cur_valid_metric < self._best_valid_metric
        )
        if improved:
            self._best_valid_metric = self._cur_valid_metric
            self.save_state_dict(self.work_path / "best_model")
            self.current_patience = 0
            # wandb alert parity (reference cpcsam_trainer.py:1029-1049)
            text_lines = [
                f"iter={self.current_iter}",
                f"epoch={self.current_epoch}",
                f"metric={self._best_valid_metric:.4f}",
                "dsc=[" + ", ".join(f"{x:.4f}" for x in per_cls[:, 0].tolist()) + "]",
                f"average_dsc={avg_dsc:.4f}",
                "hd95=[" + ", ".join(f"{x:.4f}" for x in per_cls[:, 1].tolist()) + "]",
                f"average_hd95={avg_hd95:.4f}",
            ]
            self._wandb_alert(
                title="Improved Performance",
                text="; ".join(text_lines),
                level="INFO",
            )
        else:
            self.current_patience += 1
            # stagnation alert at half the early-stop patience
            # (reference cpcsam_trainer.py:1050-1059)
            if self.config.early_stop_max_patience:
                threshold = self.config.early_stop_max_patience * 0.5
                if self.current_patience >= threshold:
                    self._wandb_alert(
                        title="Performance Stagnation",
                        text=(
                            "Performance is not improved for "
                            f"{self.current_patience} step"
                        ),
                        level="WARN",
                    )
        self.logger.info(f"current_patience: {self.current_patience}")

    def _wandb_alert(self, title: str, text: str, level: str = "INFO"):
        """Soft-fail wandb alert: no-ops without a runner, never raises
        (alerting must not kill training)."""
        if self.wandb_runner is None:
            return
        try:
            self.wandb_runner.alert(title=title, text=text, level=level)
        except Exception as exc:  # pragma: no cover
            self.logger.warning(f"wandb alert failed: {exc}")

    def valid(self):
        if self.current_iter % self.config.valid_freq_iter == 0:
            self._flush_train_logs()
            self.epoch_valid_outputs = []
            for sampled_batch in self.valid_dataloader:
                self.valid_step(sampled_batch)
            self.on_valid_epoch_end()

    def is_finished(self):
        if self.current_iter < self.config.min_iter:
            return False
        if (
            self.config.early_stop_max_patience
            and self.current_patience >= self.config.early_stop_max_patience
        ):
            self.logger.info("Exceeded maximum patience. Training will be early stopped")
            return True
        return self.current_iter >= self.config.max_iter

    def train(self):
        self.on_train_start()
        while not self.is_finished() and self.current_epoch < self.config.num_epochs:
            self.logger.info(f"Epoch {self.current_epoch}:")
            self.epoch_train_outputs = []
            for sampled_batch in self._train_loader():
                if self.is_finished():
                    break
                self.train_step(sampled_batch)
                self.valid()
            self._flush_train_logs()
            if (
                self.config.save_freq_epoch
                and (self.current_epoch + 1) % self.config.save_freq_epoch == 0
            ):
                self.save_state_dict(
                    self.work_path / f"epoch_{self.current_epoch}", True
                )
            self.current_epoch += 1
        self.save_state_dict(self.work_path / "final_model", True)
        self.perform_real_test()

    def run_training(self):
        self.train()

    def perform_real_test(self):
        if not hasattr(self, "supervised_loss"):
            self._setup_loss()
            self._make_programs()
        test_dataset = ACDCDataset(
            data_path=self.config.data_path,
            split="test",
            image_channels=self.config.in_channels,
        )
        loader = BatchLoader(
            test_dataset, batch_size=1, shuffle=False, drop_last=False, device_put=False
        )
        save_path = self.work_path / "predictions"
        metric_rows = []
        for batch in loader:
            spacing = batch.get("spacing")
            raw_spacing = None
            if spacing is not None and spacing[0] is not None:
                sp = np.asarray(spacing[0], np.float32)
                raw_spacing = np.roll(sp, 1) if sp.size == 3 else None
            metric_rows.append(
                test_single_volume_mean(
                    Path(self.config.data_path),
                    batch["image"],
                    batch["label"],
                    self._eval_apply(self.params),
                    classes=self.config.num_classes + 1,
                    patch_size=(self.config.image_size, self.config.image_size),
                    test_save_path=save_path,
                    case=batch["case_name"][0],
                    raw_spacing=raw_spacing,
                    depth_multiple=getattr(self, "_eval_depth_multiple", 1),
                )
            )
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            arr = np.asarray(metric_rows)  # (N, C-1, 4)
            per_cls = np.nanmean(arr, axis=0)
            overall = np.nanmean(per_cls, axis=0)
        self.logger.info("Real test results (DSC, HD, ASD, JC):")
        self.logger.info(f"  per-class: {per_cls.tolist()}")
        self.logger.info(f"  average: {overall.tolist()}")

        import csv

        with open(self.work_path / "test_mean.csv", "w", newline="") as f:
            writer = csv.writer(f)
            writer.writerow(["class", "DSC", "HD", "ASD", "JC"])
            for c, row in enumerate(per_cls, start=1):
                writer.writerow([c] + [float(v) for v in row])
        return {"dsc": float(overall[0]), "hd": float(overall[1])}
