"""Analytic MXU-utilization ceiling for the ALFA CIFAR workload.

VERDICT r3 weak #5 asks for an op-level argument for the ALFA step's
absolute MFU. ResNet-56s convs are SMALL: output channels 16/32/64, all
below the 128-lane MXU width, and stage-3 feature maps are 8x8. This
script enumerates every conv in the model, its FLOPs, and a per-conv
utilization ceiling from two structural bounds the XLA:TPU conv kernels
cannot beat:

  * lane bound: output channels fill C_out/128 of the MXU lanes;
  * contraction bound: the reduction dim (kh*kw*C_in) fills
    min(1, k/128) of the 128-deep systolic accumulation (k < 128 means
    the pass through the array is mostly zero-padded).

Weighting each conv's ceiling by its FLOPs gives the model-level
ceiling. This is a structural UPPER bound (ignores bandwidth, BN,
elementwise, pipeline bubbles) — the right yardstick for the measured
step MFU: report measured_mfu / ceiling as "fraction of attainable".

Pure math — runs anywhere; prints one JSON line per conv + a summary.
"""
import json

MXU = 128


def conv_entry(name, hw, cin, cout, k=3, stride=1, n=1):
    out_hw = hw // stride
    flops = 2 * (out_hw ** 2) * (k * k * cin) * cout
    lane = min(cout / MXU, 1.0)
    contract = min((k * k * cin) / MXU, 1.0)
    # the two bounds multiply only if the kernel can't co-pack; the
    # honest single-pass ceiling is the binding one (XLA packs the
    # contraction dim into multiple passes, so lanes dominate):
    ceiling = lane
    return {"name": name, "count": n, "hw": out_hw, "cin": cin,
            "cout": cout, "k": k,
            "gflops_each": round(flops / 1e9, 4),
            "lane_util": round(lane, 4),
            "contract_fill": round(contract, 4),
            "ceiling": round(ceiling, 4)}


def main():
    # This IS every conv: ResNet-56s uses option-A (stride-2 subsample +
    # zero-pad) shortcuts — there are NO 1x1 projection convs
    # (afan/models/resnet_s.py:79-85; He et al. option A). The final
    # 64->10 linear is ~0.001% of the FLOPs and is omitted.
    convs = [
        conv_entry("stem", 32, 3, 16),
        # stage1: 9 blocks x 2 convs, 16ch 32x32
        conv_entry("stage1_conv", 32, 16, 16, n=18),
        # stage2: first block downsamples (stride 2), 32ch 16x16
        conv_entry("stage2_down", 32, 16, 32, stride=2),
        conv_entry("stage2_conv", 16, 32, 32, n=17),
        # stage3: 64ch 8x8
        conv_entry("stage3_down", 16, 32, 64, stride=2),
        conv_entry("stage3_conv", 8, 64, 64, n=17),
    ]
    total_flops = 0.0
    weighted = 0.0
    for c in convs:
        fl = c["gflops_each"] * c["count"]
        total_flops += fl
        weighted += fl * c["ceiling"]
        print(json.dumps(c), flush=True)
    ceiling = weighted / total_flops
    print(json.dumps({
        "model_gflops_fwd_per_img": round(total_flops, 4),
        "flop_weighted_mxu_ceiling": round(ceiling, 4),
        "note": ("ALFA step MFU should be read against this ceiling: "
                 "measured_mfu/ceiling = fraction of the attainable "
                 "peak for these conv shapes"),
    }), flush=True)


if __name__ == "__main__":
    main()
