"""Same-session A/B of the round-4 snapshot defaults (VERDICT r4 weak #3).

Measures the CPC-SAM phase programs (the production surface both flags
feed: the dual-mask decoders' 4-stage upscaler + hypernetwork product)
under:

  A. shipped defaults      (hyper_product="auto" -> elementwise on TPU,
                            EinsumConvTranspose2x.pair_rows=True)
  B. hyper_product="einsum" (pair_rows True)
  C. pair_rows=False        (hyper_product "auto")

All three run back-to-back in ONE process on the same chip so the
cross-session 6-10% noise band (docs/PERF.md §20) does not apply; flags
are injected through the CONSTRUCTORS (per the §21 methodology note —
flax class-attribute edits silently do nothing).

Usage: python scripts/ab_decoder_flags.py
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(tag):
    from bench import bench_cpcsam_steps

    out = bench_cpcsam_steps()
    print(json.dumps({"config": tag, **out}), flush=True)
    return out


def patched(**overrides):
    """Patch the decoder classes referenced by sam.py with partials."""
    import mia_tpu.models.sam.sam as sam_mod

    originals = (sam_mod.MaskDecoder, sam_mod.MaskDecoderPromptLarge)

    class _Ctx:
        def __enter__(self):
            sam_mod.MaskDecoder = functools.partial(originals[0], **overrides)
            sam_mod.MaskDecoderPromptLarge = functools.partial(
                originals[1], **overrides
            )

        def __exit__(self, *a):
            sam_mod.MaskDecoder, sam_mod.MaskDecoderPromptLarge = originals

    return _Ctx()


def pair_rows_patched(value: bool):
    """Patch BOTH call sites: the SAM decoders (mask_decoder module global)
    and the UNet decoder (unet module global, ``unet.py:309``)."""
    import mia_tpu.models.sam.mask_decoder as md
    import mia_tpu.models.unet as un

    orig = un.EinsumConvTranspose2x

    class _Ctx:
        def __enter__(self):
            patched_cls = functools.partial(orig, pair_rows=value)
            md.EinsumConvTranspose2x = patched_cls
            un.EinsumConvTranspose2x = patched_cls

        def __exit__(self, *a):
            md.EinsumConvTranspose2x = orig
            un.EinsumConvTranspose2x = orig

    return _Ctx()


def measure_unet(tag):
    """Production AL train step (augmented, batch 128) — the pair_rows
    surface VERDICT r4 #3 names explicitly (``unet.py:252-264``)."""
    from bench import bench_unet

    ips, spread = bench_unet(augmented=True)
    print(json.dumps({"config": tag, "img_per_sec": ips,
                      "spread_pct": spread}), flush=True)
    return {"img_per_sec": ips, "spread_pct": spread}


def main():
    from mia_tpu.utils import maybe_enable_compilation_cache

    maybe_enable_compilation_cache()

    results = {}
    results["defaults"] = measure("defaults (hyper=auto, pair_rows=True)")
    with patched(hyper_product="einsum"):
        results["hyper_einsum"] = measure("hyper_product=einsum")
    with pair_rows_patched(False):
        results["pair_rows_false"] = measure("pair_rows=False")
    # re-measure defaults last to bound in-session drift
    results["defaults_again"] = measure("defaults re-run (drift bound)")

    # production AL step arm (VERDICT r4 #3: pair_rows on the UNet decoder)
    results["unet_defaults"] = measure_unet("unet AL step pair_rows=True")
    with pair_rows_patched(False):
        results["unet_pair_rows_false"] = measure_unet(
            "unet AL step pair_rows=False"
        )
    results["unet_defaults_again"] = measure_unet(
        "unet AL step pair_rows=True re-run (drift bound)"
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
