"""Per-layer conv breakdown for the CelebA-128 train step (VERDICT r1 #1a).

Times every conv shape in the production model (fwd, input-grad, weight-grad
separately via jax.grad of a dot-product loss), the TF1 resizes, and the
dlatent MLP, at the benchmark configuration (batch 64, h=512, bf16).
Prints a table with achieved TF/s per op so DESIGN.md can name the top-3
offenders. Run on the real TPU: python scripts/conv_breakdown.py
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def conv_flops(b, h, w, cout, k, cin, stride=1):
    oh, ow = h // stride, w // stride
    return 2 * b * oh * ow * cout * k * k * cin


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    B, H = args.batch, args.hidden
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    print(f"devices: {jax.devices()}", flush=True)

    # (name, H, W, Cin, Cout, k, stride, padding)
    convs = [
        ("enc1 128->64", 128, 3, H // 4, 3, 2, "SAME"),
        ("enc2 64->32", 64, H // 4, H // 4, 3, 2, "SAME"),
        ("enc3 32->16", 32, H // 4, H // 2, 3, 2, "SAME"),
        ("enc4 16->8", 16, H // 2, H // 2, 3, 2, "SAME"),
        ("enc5 8->4", 8, H // 2, H, 3, 2, "SAME"),
        ("enc6 4->2 valid", 4, H, H, 3, 1, "VALID"),
        ("dec 2x2 a", 2, H, H, 3, 1, "SAME"),
        ("dec 2x2 b", 2, H, H, 3, 1, "SAME"),
        ("dec 8x8", 8, H, H, 3, 1, "SAME"),
        ("dec 16x16", 16, H, H // 2, 3, 1, "SAME"),
        ("dec 32x32", 32, H // 2, H // 2, 3, 1, "SAME"),
        ("dec 64x64", 64, H // 2, H // 4, 3, 1, "SAME"),
        ("dec 128x128", 128, H // 4, H // 4, 3, 1, "SAME"),
        ("dec 1x1 out", 128, H // 4, 3, 1, 1, "SAME"),
    ]

    rows = []
    total = dict(fwd=0.0, dgrad=0.0, wgrad=0.0)
    rng = np.random.default_rng(0)
    for name, hw, cin, cout, k, stride, pad in convs:
        x = jnp.asarray(rng.standard_normal((B, hw, hw, cin)), dtype=dt)
        wshape = (k, k, cin, cout)
        w = jnp.asarray(rng.standard_normal(wshape) * 0.05, dtype=dt)

        def conv(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (stride, stride), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=dt)

        fwd = jax.jit(conv)
        y = fwd(x, w)
        cot = jnp.asarray(rng.standard_normal(y.shape), dtype=dt)
        dgrad = jax.jit(lambda x, w, c: jax.vjp(conv, x, w)[1](c)[0])
        wgrad = jax.jit(lambda x, w, c: jax.vjp(conv, x, w)[1](c)[1])

        t_f = timeit(fwd, x, w)
        t_d = timeit(dgrad, x, w, cot)
        t_w = timeit(wgrad, x, w, cot)
        oh = hw // stride if pad == "SAME" else hw - k + 1
        fl = 2 * B * oh * oh * cout * k * k * cin
        rows.append((name, f"{hw}x{hw}", cin, cout, fl / 1e9,
                     t_f * 1e3, fl / t_f / 1e12,
                     t_d * 1e3, fl / t_d / 1e12,
                     t_w * 1e3, fl / t_w / 1e12))
        total["fwd"] += t_f
        total["dgrad"] += t_d
        total["wgrad"] += t_w

    print(f"\nbatch={B} h={H} dtype={args.dtype}")
    print(f"{'layer':<16}{'hw':>8}{'cin':>5}{'cout':>5}{'GF':>8}"
          f"{'fwd ms':>8}{'TF/s':>7}{'dgrad ms':>9}{'TF/s':>7}"
          f"{'wgrad ms':>9}{'TF/s':>7}")
    for r in rows:
        print(f"{r[0]:<16}{r[1]:>8}{r[2]:>5}{r[3]:>5}{r[4]:>8.2f}"
              f"{r[5]:>8.2f}{r[6]:>7.1f}{r[7]:>9.2f}{r[8]:>7.1f}"
              f"{r[9]:>9.2f}{r[10]:>7.1f}")
    print(f"\nconv totals: fwd {total['fwd']*1e3:.2f} ms, "
          f"dgrad {total['dgrad']*1e3:.2f} ms, "
          f"wgrad {total['wgrad']*1e3:.2f} ms, "
          f"sum {(total['fwd']+total['dgrad']+total['wgrad'])*1e3:.2f} ms")

    # resizes
    from ladder_tpu.ops.image import resize_bilinear_tf1
    for name, hw_in, hw_out, c in [
            ("resize 4->8", 4, 8, H), ("resize 8->16", 8, 16, H),
            ("resize 16->32", 16, 32, H // 2),
            ("resize 32->64", 32, 64, H // 2),
            ("resize 64->128", 64, 128, H // 4)]:
        x = jnp.asarray(rng.standard_normal((B, hw_in, hw_in, c)), dtype=dt)
        f = jax.jit(lambda x, o=hw_out: resize_bilinear_tf1(x, o, o))
        t = timeit(f, x)
        print(f"{name:<16} c={c:<4} {t*1e3:7.3f} ms")

    # dlatent MLP (8x dense 512)
    x = jnp.asarray(rng.standard_normal((B, H)), dtype=dt)
    ws = [jnp.asarray(rng.standard_normal((H, H)) * 0.05, dtype=dt)
          for _ in range(8)]

    @jax.jit
    def mlp(x, ws):
        for w in ws:
            x = jax.nn.leaky_relu(x @ w, 0.2)
        return x

    t = timeit(mlp, x, ws)
    print(f"{'dlatent mlp x8':<16} {t*1e3:7.3f} ms")

    # matmul peak reference point
    for m, k2, n in [(16384, 1152, 128), (8192, 2048, 2048),
                     (65536, 128, 128)]:
        a = jnp.asarray(rng.standard_normal((m, k2)), dtype=dt)
        b = jnp.asarray(rng.standard_normal((k2, n)), dtype=dt)
        f = jax.jit(lambda a, b: a @ b)
        t = timeit(f, a, b)
        print(f"matmul {m}x{k2}x{n}: {t*1e3:7.3f} ms "
              f"{2*m*k2*n/t/1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()
