#!/usr/bin/env python
"""Measure MSDA sampling-location row-span statistics at bench shapes.

Builds the bench IDOL model (random init = reference init scheme: zero offset
kernel + directional grid bias), captures the encoder/decoder sampling
locations per layer, and reports per-(program, level[, point]) row-span
distributions plus executed-FLOP estimates for candidate kernel schedules.
Runs on CPU.
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

T, H, W = 2, 480, 864  # 2 frames is enough for span stats (per-frame identical refs)


def main():
    from vnext_tpu.models import IDOL
    from vnext_tpu.models.idol import build_idol_model
    from vnext_tpu.config import get_cfg, add_idol_config
    import importlib
    msda_mod = importlib.import_module("vnext_tpu.ops.ms_deform_attn")

    cfg = get_cfg(); add_idol_config(cfg); cfg.MODEL.IDOL.NUM_CLASSES = 40
    model = build_idol_model(cfg, dtype=jnp.float32)

    captured = []
    orig = msda_mod.ms_deform_attn

    def capture(value, spatial_shapes, loc, attn, impl="auto"):
        captured.append((tuple(spatial_shapes), np.asarray(loc), np.asarray(attn)))
        return msda_mod.ms_deform_attn_core_jnp(value, spatial_shapes, loc, attn)

    msda_mod.ms_deform_attn = capture
    # also patch the symbol imported into deformable_transformer
    import vnext_tpu.models.deformable_transformer as dt
    dt.ms_deform_attn = capture

    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randn(T, H, W, 3), jnp.float32)
    sizes = jnp.asarray([[H, W - 11]] * T, jnp.int32)
    with jax.disable_jit():
        variables = model.init({"params": jax.random.PRNGKey(0)}, frames, sizes,
                               method=IDOL.inference)
    msda_mod.ms_deform_attn = orig
    dt.ms_deform_attn = orig

    print(f"captured {len(captured)} MSDA calls")
    if os.environ.get("VNEXT_DUMP_LOCS"):
        S0 = sum(h * w for h, w in captured[0][0])
        encs = [(ss, l, a) for ss, l, a in captured if l.shape[1] == S0]
        decs = [(ss, l, a) for ss, l, a in captured if l.shape[1] != S0]
        np.savez(
            os.environ["VNEXT_DUMP_LOCS"],
            shapes=np.asarray(captured[0][0]),
            enc_loc=encs[0][1], enc_attn=encs[0][2],
            enc_loc_last=encs[-1][1], enc_attn_last=encs[-1][2],
            dec_loc=decs[0][1] if decs else np.zeros(1),
            dec_attn=decs[0][2] if decs else np.zeros(1),
        )
        print(f"dumped locs to {os.environ['VNEXT_DUMP_LOCS']}")
    shapes = captured[0][0]
    print("levels:", shapes)

    def span_stats(loc, attn, spatial_shapes, tq, per_point, name):
        """loc [B, Q, M, L, P, 2]; spans in original rows per level."""
        B, Q, M, L, P, _ = loc.shape
        qpad = -(-Q // tq) * tq
        if qpad != Q:
            pad = np.full((B, qpad - Q, M, L, P, 2), 0.5, loc.dtype)
            loc = np.concatenate([loc, pad], axis=1)
        nt = qpad // tq
        # [B, M, nt, tq, L, P]
        y = np.moveaxis(loc[..., 1], 2, 1).reshape(B, M, nt, tq, L, P)
        rows = []
        for l, (h, w) in enumerate(spatial_shapes):
            ypix = y[..., l, :] * h - 0.5
            y0 = np.floor(ypix)
            lo = np.maximum(y0, 0)
            hi = np.minimum(y0 + 1, h - 1)
            valid = (y0 + 1 >= 0) & (y0 <= h - 1)
            lo = np.where(valid, lo, h)
            hi = np.where(valid, hi, -1)
            if per_point:
                # span per (B, M, tile, point)
                rmin = lo.min(axis=3)   # [B, M, nt, P]
                rmax = hi.max(axis=3)
            else:
                rmin = lo.min(axis=(3, 4))  # [B, M, nt]
                rmax = hi.max(axis=(3, 4))
            span = np.maximum(rmax - rmin + 1, 0)
            rows.append(span.ravel())
        lbl = "per-point" if per_point else "union"
        print(f"\n{name} TQ={tq} {lbl} spans (rows):")
        for l, s in enumerate(rows):
            print(f"  L{l} {shapes[l] if name=='encoder' else spatial_shapes[l]}: "
                  f"mean={s.mean():6.2f} p50={np.percentile(s,50):5.1f} "
                  f"p90={np.percentile(s,90):5.1f} p99={np.percentile(s,99):5.1f} max={s.max():5.0f}")
        return rows

    def executed_flops(rows, spatial_shapes, tq, per_point, hb, B, M, Q, P, D=32):
        """FLOPs per layer for the chunked selector-matmul schedule."""
        total = 0
        ncols = tq if per_point else tq * P
        for l, (h, w) in enumerate(spatial_shapes):
            wpad = -(-w // 128) * 128
            span = rows[l]
            nch = np.maximum(-(-span // hb), (span > 0).astype(np.int64))
            nch = np.where(span == 0, 0, nch)
            total += 2.0 * nch.sum() * hb * D * wpad * ncols
        return total

    def v8_flops(loc, spatial_shapes, tq, gsz, hbs, packed, D=32):
        """Candidate v8 schedule: group-of-gsz-points chunked levels + packed
        resident small levels. Returns flops/layer scaled to 10 frames."""
        B, Q, M, L, P, _ = loc.shape
        qpad = -(-Q // tq) * tq
        if qpad != Q:
            pad = np.full((B, qpad - Q, M, L, P, 2), 0.5, loc.dtype)
            loc = np.concatenate([loc, pad], axis=1)
        nt = qpad // tq
        y = np.moveaxis(loc[..., 1], 2, 1).reshape(B, M, nt, tq, L, P)
        total = 0.0
        for l, (h, w) in enumerate(spatial_shapes):
            if l in packed:
                wp = w + 1
                k = min(128 // wp - 1, h)
                hp = -(-h // k)
                total += loc.shape[0] * M * nt * 2.0 * hp * D * 128 * (P * tq)
                continue
            wpad = -(-w // 128) * 128
            hb = hbs[l]
            ypix = y[..., l, :] * h - 0.5
            y0 = np.floor(ypix)
            lo = np.maximum(y0, 0); hi = np.minimum(y0 + 1, h - 1)
            valid = (y0 + 1 >= 0) & (y0 <= h - 1)
            lo = np.where(valid, lo, h); hi = np.where(valid, hi, -1)
            ng = P // gsz
            lo = lo.reshape(B, M, nt, tq, ng, gsz)
            hi = hi.reshape(B, M, nt, tq, ng, gsz)
            rmin = lo.min(axis=(3, 5)); rmax = hi.max(axis=(3, 5))
            span = np.maximum(rmax - rmin + 1, 0)
            nch = np.where(span == 0, 0, -(-span // hb))
            total += 2.0 * nch.sum() * hb * D * wpad * (gsz * tq)
        return total * 10 / B

    # encoder call(s): Q == sum hw
    S = sum(h * w for h, w in shapes)
    enc = [(ss, l, a) for ss, l, a in captured if l.shape[1] == S]
    dec = [(ss, l, a) for ss, l, a in captured if l.shape[1] != S]
    print(f"\nencoder calls: {len(enc)}, decoder calls: {len(dec)}")

    for li, (ss, loc, attn) in enumerate(enc[:1]):
        B, Q, M, L, P, _ = loc.shape
        print(f"\n===== encoder layer sample {li} (Q={Q}) =====")
        u = span_stats(loc, attn, ss, 256, False, "encoder")
        f_v7 = executed_flops(u, ss, 256, False, 16, B, M, Q, P)
        print(f"  v7-style union HB=16: {f_v7/1e9*10/B:.0f} GF/layer @10 frames")
        f_v7b = executed_flops(u, ss, 256, False, 8, B, M, Q, P)
        print(f"  v7-style union HB=8:  {f_v7b/1e9*10/B:.0f} GF/layer")
        print("\n  v8 candidates (flops/layer @10 frames, packed L3 or L2+L3):")
        for tq in (128, 256):
            for gsz in (1, 2, 4):
                for hb0, hb1, hb2 in ((4, 4, 4), (8, 4, 4), (8, 8, 4), (4, 2, 2)):
                    for packed in ((3,), (2, 3)):
                        hbs = {0: hb0, 1: hb1, 2: hb2}
                        f = v8_flops(loc, ss, tq, gsz, hbs, packed)
                        print(f"    TQ={tq} gsz={gsz} HB=({hb0},{hb1},{hb2}) "
                              f"packed={packed}: {f/1e9:7.0f} GF")

    if dec:
        ss, loc, attn = dec[0]
        B, Q, M, L, P, _ = loc.shape
        print(f"\n===== decoder layer 0 (Q={Q}) =====")
        u = span_stats(loc, attn, ss, 256, False, "decoder")
        f = executed_flops(u, ss, 256, False, 16, B, M, Q, P)
        print(f"  v7-style union HB=16 flops/layer: {f/1e9:.2f} GF (x{10/B:.0f} -> {f/1e9*10/B:.2f})")
        pp = span_stats(loc, attn, ss, 256, True, "decoder")
        f = executed_flops(pp, ss, 256, True, 8, B, M, Q, P)
        print(f"  per-point TQ=256 HB=8: {f/1e9:.2f} GF (x{10/B:.0f} -> {f/1e9*10/B:.2f})")


if __name__ == "__main__":
    main()
