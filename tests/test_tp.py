"""Tensor-parallel SAM encoder (mia_tpu.parallel.tp) and FSDP sharding
(mia_tpu.parallel.fsdp) — parity vs the single-device flax encoder and the
replicated DP train step on the 8-virtual-CPU-device mesh (conftest)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mia_tpu.models.sam.image_encoder import ImageEncoderViT
from mia_tpu.parallel import (
    fsdp_param_specs,
    make_mesh,
    make_tp_encoder_forward,
    prepare_tp_params,
    replicate,
    shard_batch,
    shard_state_fsdp,
    tp_shardings,
    unprepare_tp_params,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def tiny_encoder(lora_rank=0):
    return ImageEncoderViT(
        img_size=32,
        patch_size=8,  # 4x4 grid
        embed_dim=32,
        depth=3,
        num_heads=4,
        mlp_ratio=4.0,
        out_chans=16,
        use_rel_pos=True,
        window_size=2,
        global_attn_indexes=(1,),
        lora_rank=lora_rank,
        fused="never",  # einsum reference path on CPU
    )


@pytest.fixture(scope="module")
def enc_setup():
    enc = tiny_encoder(lora_rank=2)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(8, 32, 32, 3)), jnp.float32
    )
    variables = enc.init(jax.random.PRNGKey(0), x)
    # zero-init lora_b + zeros pos/rel would hide bugs — randomize all
    leaves, treedef = jax.tree.flatten(variables["params"])
    rng = np.random.default_rng(1)
    leaves = [
        jnp.asarray(rng.normal(scale=0.05, size=l.shape), l.dtype)
        for l in leaves
    ]
    params = jax.tree.unflatten(treedef, leaves)
    ref = enc.apply({"params": params}, x)
    return enc, params, x, ref


def test_prepare_roundtrip(enc_setup):
    enc, params, _, _ = enc_setup
    prepared = prepare_tp_params(params, enc.num_heads)
    back = unprepare_tp_params(prepared, enc.num_heads)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params,
        back,
    )


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4)])
def test_tp_forward_matches_single_device(enc_setup, mesh_shape):
    enc, params, x, ref = enc_setup
    mesh = make_mesh(("data", "model"), shape=mesh_shape)
    prepared = jax.device_put(
        prepare_tp_params(params, enc.num_heads),
        tp_shardings(prepare_tp_params(params, enc.num_heads), mesh),
    )
    fwd = jax.jit(make_tp_encoder_forward(enc, mesh))
    out = fwd(prepared, shard_batch(x, mesh))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6
    )


def test_tp_gradients_match_single_device(enc_setup):
    enc, params, x, _ = enc_setup
    mesh = make_mesh(("data", "model"), shape=(2, 4))

    def ref_loss(p):
        return jnp.sum(enc.apply({"params": p}, x).astype(jnp.float32) ** 2)

    ref_grads = jax.grad(ref_loss)(params)

    fwd = make_tp_encoder_forward(enc, mesh)
    prepared = prepare_tp_params(params, enc.num_heads)
    prepared = jax.device_put(prepared, tp_shardings(prepared, mesh))
    xs = shard_batch(x, mesh)

    def tp_loss(p):
        return jnp.sum(fwd(p, xs).astype(jnp.float32) ** 2)

    tp_grads = unprepare_tp_params(
        jax.jit(jax.grad(tp_loss))(prepared), enc.num_heads
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
        ),
        ref_grads,
        tp_grads,
    )


def test_tp_grad_shardings_follow_params(enc_setup):
    # param cotangents must come back sharded like the params (ZeRO-style
    # sharded optimizer state depends on it)
    enc, params, x, _ = enc_setup
    mesh = make_mesh(("data", "model"), shape=(2, 4))
    fwd = make_tp_encoder_forward(enc, mesh)
    prepared = prepare_tp_params(params, enc.num_heads)
    shardings = tp_shardings(prepared, mesh)
    prepared = jax.device_put(prepared, shardings)
    xs = shard_batch(x, mesh)
    grads = jax.jit(
        jax.grad(lambda p: jnp.sum(fwd(p, xs).astype(jnp.float32) ** 2))
    )(prepared)
    qkv_g = grads["block0"]["attn"]["qkv"]["kernel"]
    qkv_s = shardings["block0"]["attn"]["qkv"]["kernel"]
    assert qkv_g.sharding.is_equivalent_to(qkv_s, qkv_g.ndim)


@pytest.mark.slow
def test_cpcsam_tp_step_matches_dp(tmp_path):
    """CPCSAMTrainer on a ("data","model") mesh runs the encoder tensor-
    parallel (shard_map) and produces the same phase-1/phase-2 losses as
    the data-parallel mesh."""
    from synth_data import make_acdc

    import mia_tpu.models.sam.build_sam as bs
    from mia_tpu.memories import init_feature_memory
    from mia_tpu.training import cpcsam_trainer as ct
    from mia_tpu.training.cpcsam_trainer import CPCSAMTrainer

    make_acdc(tmp_path / "data", n_slices=8, n_vols=1, size=(32, 32), depth=2)
    config = dict(
        seed=5,
        num_classes=3,
        image_size=32,
        batch_size=8,
        labeled_num=1,
        data_path=str(tmp_path / "data"),
        min_iter=1,
        max_iter=1,
        warmup_iter=0,  # phase 2 live
        valid_freq_iter=100,
        lr_warmup_iter=1,
        num_epochs=1,
        lora_rank=2,
    )
    orig = bs._VIT_SPECS["vit_b"]
    bs._VIT_SPECS["vit_b"] = dict(embed_dim=32, depth=2, num_heads=2, global_idx=(1,))
    old_slices = ct.PATIENTS_TO_SLICES["ACDC"]["1"]
    ct.PATIENTS_TO_SLICES["ACDC"]["1"] = 4
    try:
        images = jnp.asarray(
            np.random.default_rng(0).random((8, 32, 32, 3)), jnp.float32
        )
        labels = jnp.asarray(
            np.random.default_rng(1).integers(0, 4, (8, 32, 32)), jnp.int32
        )

        def run(mesh_axes, shape):
            mesh = make_mesh(mesh_axes, shape=shape)
            trainer = CPCSAMTrainer(
                work_path=tmp_path / f"w{len(mesh_axes)}",
                config=config, verbose=False, mesh=mesh,
            )
            trainer.initialize()
            trainer._setup_loss()
            trainer._setup_optimizer()
            trainer._make_programs()
            memory = init_feature_memory(3, 2 * (256 // 16))
            p1, o1, m1, met1 = trainer._step_phase1(
                trainer.params, trainer.opt_state, memory, images, labels,
                jax.random.PRNGKey(2), jnp.asarray(0),
            )
            _, _, _, met2 = trainer._step_phase2(
                p1, o1, m1, images, labels,
                jax.random.PRNGKey(3), jnp.asarray(1),
            )
            return (
                float(met1["loss"]), float(met2["loss"]), float(met2["loss2"])
            )

        dp = run(("data",), (8,))
        tp = run(("data", "model"), (4, 2))
        np.testing.assert_allclose(tp, dp, rtol=2e-4, atol=1e-5)
        assert tp[2] != 0.0  # phase-2 consistency term actually live
    finally:
        bs._VIT_SPECS["vit_b"] = orig
        ct.PATIENTS_TO_SLICES["ACDC"]["1"] = old_slices


def test_fsdp_step_matches_replicated(tmp_path):
    from mia_tpu.losses import DiceAndCELoss
    from mia_tpu.models.unet import UNet, UNetConfig
    from mia_tpu.schedule import poly_warmup_schedule
    from mia_tpu.training import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    cfg = UNetConfig(in_channels=3, out_classes=3, channels_list=(8, 16),
                     dropout_prob=None)
    model = UNet(cfg)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((8, 32, 32, 3), np.float32))
    labels = jnp.asarray(rng.integers(0, 3, (8, 32, 32)), jnp.int32)
    lr = poly_warmup_schedule(1e-3, max_steps=10, warmup_steps=0)
    tx = make_optimizer("adam", lr, grad_clip=10.0)
    mesh = make_mesh(("data",))
    loss = DiceAndCELoss(dice_weight=0.5, ce_weight=0.5)
    # min_size=0: shard every leaf that divides, the strictest layout
    template = create_train_state(model, jax.random.PRNGKey(0), images[:1], tx)
    from mia_tpu.parallel import fsdp_shardings

    step_fsdp = make_train_step(
        loss, lr, mesh=mesh, donate=False,
        state_shardings=fsdp_shardings(template, mesh, min_size=0),
    )
    step_repl = make_train_step(loss, lr, mesh=mesh, donate=False)

    def run(step, shard_fn):
        state = create_train_state(model, jax.random.PRNGKey(0), images[:1], tx)
        state = shard_fn(state)
        imgs, labs = shard_batch(images, mesh), shard_batch(labels, mesh)
        for _ in range(3):
            state, metrics = step(state, imgs, labs, jax.random.PRNGKey(1))
        return float(metrics["loss"]), state

    loss_fsdp, state_fsdp = run(
        step_fsdp, lambda s: shard_state_fsdp(s, mesh, min_size=0)
    )
    loss_repl, state_repl = run(step_repl, lambda s: replicate(s, mesh))
    assert abs(loss_fsdp - loss_repl) < 1e-5
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        state_fsdp.params,
        state_repl.params,
    )
    # at least one large param leaf must actually be sharded
    specs = fsdp_param_specs(state_fsdp.params, mesh, min_size=0)
    assert any(
        s != jax.sharding.PartitionSpec() for s in jax.tree.leaves(
            specs, is_leaf=lambda s: isinstance(s, jax.sharding.PartitionSpec)
        )
    )
