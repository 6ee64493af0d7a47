"""Price an LSVC config's BD-rate vs LSVC-128 at the 128px hd rung.

Reuses the TestHDHeadToHead machinery (tests/test_rd.py): real
bitstreams via lsvc_compress on the held-out multi-object clips
(seed 123), curves over assets/hd_{fam}_l{0,2,4}.npz, BD-rate/BD-PSNR
vs the reference-structure LSVC-128 curve.  Used to price the
decode-headroom candidates (VERDICT r4 item 5: the space between the
reference-shape U-net refinement and the rejected '-WT'):

    python tools/price_hd.py LSVC-TPU-QU lsvctpuqu
    python tools/price_hd.py LSVC-TPU-HU lsvctpuhu

Prints one JSON line per config with the curve and the BD numbers.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from fastvideocodec_tpu.analysis.bdrate import bd_psnr, bd_rate  # noqa: E402
from test_rd import TestHDHeadToHead  # noqa: E402


def main():
    pairs = list(zip(sys.argv[1::2], sys.argv[2::2]))
    if not pairs:
        pairs = [("LSVC-TPU-QU", "lsvctpuqu"), ("LSVC-TPU-HU", "lsvctpuhu")]
    t = TestHDHeadToHead()
    clips = t._clips()
    ref = t._curve("LSVC-128", "lsvc128", clips)
    print(json.dumps({"config": "LSVC-128", "bpp": ref[0], "psnr": ref[1]}),
          flush=True)
    for name, fam in pairs:
        bpp, psnr = t._curve(name, fam, clips)
        print(json.dumps({
            "config": name, "fam": fam, "bpp": bpp, "psnr": psnr,
            "bd_rate_vs_128": round(bd_rate(*ref, bpp, psnr), 2),
            "bd_psnr_vs_128": round(bd_psnr(*ref, bpp, psnr), 3),
        }), flush=True)


if __name__ == "__main__":
    main()
