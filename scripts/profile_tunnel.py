"""Probe the axon TPU-tunnel's latency semantics.

Questions (all shape what the serving path can achieve, VERDICT r3 #1):
1. Is the ~30 ms floor a per-interaction RTT or a polling tick?
2. Are computed results streamed back automatically (free np.asarray)?
3. Does device_get of many arrays batch into one round trip?
4. What's the H2D cost of small payloads (coords) vs images?
5. Does a dispatch+fetch chain pay 1x or 2x the floor?
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp


def t(fn, iters=10, warmup=2):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    print("devices:", jax.devices())

    f = jax.jit(lambda x: x * 2 + 1)
    g = jax.jit(lambda x: jnp.sum(x) * 3)

    x = jax.device_put(np.ones((512, 512, 3), np.float32))
    _ = np.asarray(f(x))  # compile

    # 1. fetch of freshly computed 3MB result (dispatch + compute + D2H)
    print(f"dispatch+fetch 3MB      : {t(lambda: np.asarray(f(x))):8.2f} ms")

    # 2. fetch after the result has had time to land
    y = f(x)
    time.sleep(0.3)
    print(f"fetch settled 3MB       : {t(lambda: np.asarray(y)):8.2f} ms")
    y2 = f(x)
    time.sleep(0.3)
    t0 = time.perf_counter()
    np.asarray(y2)
    print(f"fetch settled 3MB once  : {(time.perf_counter()-t0)*1e3:8.2f} ms")

    # 3. dispatch scalar + fetch
    _ = float(g(x))
    print(f"dispatch+fetch scalar   : {t(lambda: float(g(x))):8.2f} ms")

    # 4. two dependent dispatches then one fetch
    def chain2():
        a = f(x)
        b = g(a)
        return float(b)

    chain2()
    print(f"2 dispatches + 1 fetch  : {t(chain2):8.2f} ms")

    # 5. one dispatch, fetch THREE outputs via device_get (batched?)
    h = jax.jit(lambda x: (x * 2, jnp.sum(x), x[:4, :4, 0]))
    outs = h(x)
    jax.device_get(outs)

    def fetch3():
        return jax.device_get(h(x))

    print(f"dispatch + device_get x3: {t(fetch3):8.2f} ms")

    # 6. three sequential np.asarray fetches of the same program's outputs
    def fetch3seq():
        a, b, c = h(x)
        np.asarray(a)
        np.asarray(b)
        np.asarray(c)

    print(f"dispatch + 3 seq fetches: {t(fetch3seq):8.2f} ms")

    # 7. H2D tiny payload (prompt coords)
    coords = np.zeros((1, 16, 2), np.float32)
    fsum = jax.jit(lambda c: jnp.sum(c))
    _ = float(fsum(jax.device_put(coords)))
    print(
        f"H2D tiny + disp + fetch : "
        f"{t(lambda: float(fsum(jax.device_put(coords)))):8.2f} ms"
    )

    # 8. device_put alone, tiny vs 768KB vs 3MB (no fetch, async?)
    img_u8 = np.zeros((512, 512, 3), np.uint8)
    img_f32 = np.zeros((512, 512, 3), np.float32)
    print(f"device_put tiny (async?): {t(lambda: jax.device_put(coords)):8.2f} ms")
    print(f"device_put 768KB        : {t(lambda: jax.device_put(img_u8)):8.2f} ms")
    print(f"device_put 3MB          : {t(lambda: jax.device_put(img_f32)):8.2f} ms")

    # 9. device_put then immediately use + fetch scalar (does put overlap?)
    def put_use():
        d = jax.device_put(img_u8)
        return float(g(d.astype(jnp.float32)))

    put_use()
    print(f"put 768KB + disp + fetch: {t(put_use):8.2f} ms")

    def put_use_f32():
        d = jax.device_put(img_f32)
        return float(g(d))

    put_use_f32()
    print(f"put 3MB + disp + fetch  : {t(put_use_f32):8.2f} ms")

    # 10. jnp.asarray vs device_put for host numpy (what predictor uses)
    def asarray_use():
        d = jnp.asarray(img_f32)
        return float(g(d))

    asarray_use()
    print(f"jnp.asarray 3MB + fetch : {t(asarray_use):8.2f} ms")

    # 11. block_until_ready semantics
    def bur():
        f(x).block_until_ready()

    bur()
    print(f"dispatch+block_until_rdy: {t(bur):8.2f} ms")


if __name__ == "__main__":
    main()
