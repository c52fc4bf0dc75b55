"""Mask-decoder hypernetwork-product equality (VERDICT r4 weak #3).

``_DecoderCore.hyper_product`` has two lowerings of the same contraction
(masks[b,h,w,t] = sum_c hyper[b,t,c] * upscaled[b,h,w,c]): "einsum" and
"elementwise" (a fusable broadcast-multiply + tiny-axis sum, the TPU
default when C' <= 32). The elementwise branch was previously only
reachable on a TPU backend, so the CPU suite could never execute it —
these tests force each branch explicitly and pin exact agreement of all
outputs and gradients, for both the plain 2-stage decoder and the
4-stage prompt-large decoder (reference
``mask_decoder.py:16-174`` / ``mask_decoder_prompt_large.py:16-157``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mia_tpu.models.sam.mask_decoder import MaskDecoder, MaskDecoderPromptLarge
from mia_tpu.models.sam.transformer import TwoWayTransformer


DIM = 32


def _build(cls, hyper_product):
    return cls(
        transformer_dim=DIM,
        transformer=TwoWayTransformer(
            depth=1, embedding_dim=DIM, num_heads=2, mlp_dim=64
        ),
        num_multimask_outputs=3,
        hyper_product=hyper_product,
    )


@pytest.mark.parametrize("cls", [MaskDecoder, MaskDecoderPromptLarge])
def test_hyper_product_branches_agree(cls, rng):
    b, h, w = 2, 8, 8
    emb = jnp.asarray(rng.random((b, h, w, DIM), np.float32))
    pe = jnp.asarray(rng.random((1, h, w, DIM), np.float32))
    sparse = jnp.asarray(rng.random((b, 3, DIM), np.float32))
    dense = jnp.asarray(rng.random((b, h, w, DIM), np.float32))

    ew = _build(cls, "elementwise")
    es = _build(cls, "einsum")
    variables = ew.init(jax.random.PRNGKey(0), emb, pe, sparse, dense, True)

    def run(model, v):
        out = model.apply(v, emb, pe, sparse, dense, True)
        return out if isinstance(out, tuple) else (out,)

    out_ew = run(ew, variables)
    out_es = run(es, variables)
    assert len(out_ew) == len(out_es)
    for a, b_ in zip(out_ew, out_es):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-6, atol=1e-6
        )

    def loss(model):
        def f(v):
            outs = run(model, v)
            return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)

        return f

    g_ew = jax.grad(loss(ew))(variables)
    g_es = jax.grad(loss(es))(variables)
    # the branches accumulate the C' sum in a different order, so grads
    # agree to float32 accumulation noise, not bit-exactly
    for a, b_ in zip(jax.tree.leaves(g_ew), jax.tree.leaves(g_es)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-4, atol=2e-4
        )


def test_hyper_product_auto_resolves_einsum_off_tpu(rng):
    """On a non-TPU backend "auto" must take the einsum branch (the
    elementwise lowering is a TPU fusion-shape decision)."""
    b, h, w = 1, 4, 4
    emb = jnp.asarray(rng.random((b, h, w, DIM), np.float32))
    pe = jnp.asarray(rng.random((1, h, w, DIM), np.float32))
    sparse = jnp.asarray(rng.random((b, 2, DIM), np.float32))
    dense = jnp.asarray(rng.random((b, h, w, DIM), np.float32))

    auto = _build(MaskDecoder, "auto")
    es = _build(MaskDecoder, "einsum")
    variables = auto.init(jax.random.PRNGKey(0), emb, pe, sparse, dense, True)
    a_masks, _ = auto.apply(variables, emb, pe, sparse, dense, True)
    e_masks, _ = es.apply(variables, emb, pe, sparse, dense, True)
    assert jax.default_backend() != "tpu"
    np.testing.assert_array_equal(np.asarray(a_masks), np.asarray(e_masks))


@pytest.mark.parametrize("stages,hw", [(2, 8), (4, 4)])
def test_upscaler_tap_matches_interleave(stages, hw, rng):
    """The tap-space upscaler (all stages at the embedding's spatial size,
    one final depth-to-space — docs/PERF.md §27) computes the SAME values
    as the per-stage interleave path from the SAME parameter tree: k2s2
    stages never mix spatial neighbours, so the chain is a per-input-pixel
    map and only the materialization order differs. Values agree to 1-ulp
    f32 reassociation noise; the parameter trees (and hence checkpoints)
    are identical."""
    from mia_tpu.models.sam.mask_decoder import _Upscaler

    x = jnp.asarray(rng.standard_normal((2, hw, hw, DIM)).astype(np.float32))
    up_tap = _Upscaler(DIM, stages, layout="tap")
    up_int = _Upscaler(DIM, stages, layout="interleave")
    variables = up_tap.init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(variables) == jax.tree.structure(
        up_int.init(jax.random.PRNGKey(0), x)
    )
    y_tap = up_tap.apply(variables, x)
    y_int = up_int.apply(variables, x)
    assert y_tap.shape == (2, hw << stages, hw << stages, y_int.shape[-1])
    np.testing.assert_allclose(
        np.asarray(y_tap), np.asarray(y_int), rtol=1e-5, atol=1e-5
    )

    def loss(up):
        def f(v):
            return jnp.sum(up.apply(v, x).astype(jnp.float32) ** 2)
        return f

    g_tap = jax.grad(loss(up_tap))(variables)
    g_int = jax.grad(loss(up_int))(variables)
    # grads are large reassociated reductions chained through LN rsqrt
    # derivatives — observed up to ~8e-4 relative on single elements; the
    # forward equality above is the sharp layout-equivalence assertion
    for a, b in zip(jax.tree.leaves(g_tap), jax.tree.leaves(g_int)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-3
        )
