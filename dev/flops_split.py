"""Closed-form FLOPs split of one UNet microbatch forward (B=8, 40x64x16)
by op class — the denominator algebra for the MFU ceiling analysis in
BENCH_NOTES (round-5).

Splits the transformer FLOPs into (a) projection/FF matmuls (C-wide GEMMs,
run near MXU peak) and (b) attention-core matmuls (QK^T / PV with head
depth d=64 — structurally capped at ~50% of the 128x128 MXU because the
contraction (QK^T) or the output width (PV) is 64). The conv class is taken
from the measured `dev/ablate_unet.py convs_only` cost_analysis number.

Architecture facts (config.py UNetConfig / models/unet3d.py, mirrors
lvdm/modules/networks/openaimodel3d.py:312): model_channels 320,
channel_mult (1,2,4,4), num_res_blocks 2, attention at ds=(1,2,4),
num_head_channels 64, temporal_length 16, dual text+img cross KV
(77 + 16 = 93 context tokens), GEGLU mult 4.

Pure host arithmetic — no jax, runs anywhere instantly.
"""

B, F = 8, 16
H0, W0 = 40, 64
CTX_L, CTX_D = 93, 1024
T = 16  # temporal tokens

# (C, H, W, n_spatial_instances, n_temporal_instances) per attention level.
# input blocks: 2 per level w/ attention; output blocks: 3; mid: 1 (C=1280
# at ds=8 -> 5x8). addition_attention adds 1 temporal-only init attn at L0.
LEVELS = [
    (320, 40, 64, 5, 5),
    (640, 20, 32, 5, 5),
    (1280, 10, 16, 5, 5),
    (1280, 5, 8, 1, 1),  # middle block
]
INIT_ATTN = (320, 40, 64)  # addition_attention: temporal-only, no proj FF


def spatial_instance(C, N):
    R = B * F
    proj = 40 * R * N * C * C  # proj_in/out 4 + self QKV/out 8 + cross Q/out 4 + GEGLU 24
    proj += 4 * R * CTX_L * C * CTX_D  # cross K,V from context
    core_self = 4 * R * N * N * C
    core_cross = 4 * R * N * CTX_L * C
    return proj, core_self + core_cross


def temporal_instance(C, N, with_ff=True):
    R = B * N
    proj = (4 + 8 + (24 if with_ff else 0)) * R * T * C * C
    core = 4 * R * T * T * C
    return proj, core


def main():
    tot_proj = tot_core = 0
    print(f"{'level':>22s} {'proj TF':>9s} {'core TF':>9s} {'core %':>7s}")
    for C, H, W, ns, nt in LEVELS:
        N = H * W
        sp, sc = spatial_instance(C, N)
        tp, tc = temporal_instance(C, N)
        proj, core = ns * sp + nt * tp, ns * sc + nt * tc
        tot_proj += proj
        tot_core += core
        print(f"C={C:<5d} N={N:<5d} x{ns}/{nt}: {proj/1e12:9.2f} {core/1e12:9.2f} "
              f"{100*core/(proj+core):6.1f}%")
    C, H, W = INIT_ATTN
    ip, ic = temporal_instance(C, H * W, with_ff=False)
    tot_proj += ip
    tot_core += ic
    print(f"{'init_attn':>22s}: {ip/1e12:9.2f} {ic/1e12:9.2f}")

    print(f"\ntransformer projection/FF GEMM FLOPs: {tot_proj/1e12:7.2f} TF")
    print(f"transformer attention-core FLOPs:     {tot_core/1e12:7.2f} TF")
    print(f"transformer total:                    {(tot_proj+tot_core)/1e12:7.2f} TF")

    # ceiling: convs at their measured rate, projections at the measured
    # best GEMM-class rate, attention core at the d=64 structural cap.
    PEAK = 197e12
    conv_tf, conv_rate = 48.49, 136.5e12  # ablate convs_only @ 485b01
    proj_rate = 150e12  # large C-wide GEMMs, bf16 (~76% MXU, measured class)
    core_rate = 0.5 * PEAK  # d=64 head depth halves the 128-wide MXU
    t_floor = conv_tf * 1e12 / conv_rate + tot_proj / proj_rate + tot_core / core_rate
    tot_tf = conv_tf + (tot_proj + tot_core) / 1e12
    print(f"\nfloor estimate: {t_floor*1e3:6.1f} ms/fwd "
          f"-> {tot_tf/t_floor:6.1f} TFLOP/s = {tot_tf*1e12/t_floor/PEAK*100:5.1f}% MFU")

    # per-instance matmul floors vs the measured ladder-best slopes
    # (BENCH_NOTES round-4 plan table + the 485bc01 C=1280 re-sweep)
    MEAS = {(320, "s"): 29.58, (320, "t"): 16.36,
            (640, "s"): 12.85, (640, "t"): 10.13,
            (1280, "s"): 11.65, (1280, "t"): 9.30}
    print(f"\n{'instance':>18s} {'floor ms':>9s} {'meas ms':>8s} {'gap ms':>7s}")
    for C, H, W, ns, nt in LEVELS[:3]:
        N = H * W
        sp, sc = spatial_instance(C, N)
        tp, tc = temporal_instance(C, N)
        fs = (sp / proj_rate + sc / core_rate) * 1e3
        ft = (tp / proj_rate + tc / core_rate) * 1e3
        print(f"spatial C={C:<5d}: {fs:9.1f} {MEAS[(C,'s')]:8.2f} {MEAS[(C,'s')]-fs:7.1f}")
        print(f"temporal C={C:<4d}: {ft:9.1f} {MEAS[(C,'t')]:8.2f} {MEAS[(C,'t')]-ft:7.1f}")


if __name__ == "__main__":
    main()
