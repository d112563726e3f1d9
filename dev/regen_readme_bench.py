#!/usr/bin/env python
"""Regenerate README.md's benchmark-table numbers from BENCH_SUITE.json
(round-4 verdict weak #7: the table must be generated, not typed).

Only the rows backed by bench.py suite entries are rewritten; rows with
their own tools (Mask R-CNN, bare MSDA layer) are left alone.
Run after bench.py: python dev/regen_readme_bench.py
"""

import json
import os
import re
import sys

ROOT = os.path.join(os.path.dirname(__file__), "..")

ROWS = {
    "idol_infer": (r"(\| IDOL-R50 clip inference \(480×864, clip=10\) \| )\*\*[\d.]+ fps/chip\*\*",
                   "**{v:.1f} fps/chip**"),
    "seqformer": (r"(\| SeqFormer-R50 whole-clip inference \| )\*\*[\d.]+ fps/chip\*\*",
                  "**{v:.1f} fps/chip**"),
    "minvis": (r"(\| MinVIS/Mask2Former-R50 frame inference \| )\*\*[\d.]+ fps/chip\*\*",
               "**{v:.1f} fps/chip**"),
    "swinl": (r"(\| IDOL-Swin-L clip inference \| )\*\*[\d.]+ fps/chip\*\*",
              "**{v:.1f} fps/chip**"),
    "idol_train": (r"(\| IDOL-R50 train step \(bs=4 clips × 2 frames, 512×640\) \| )\*\*[\d.]+ ms/iter\*\*",
                   "**{v:.1f} ms/iter**"),
    "instmove": (r"(\| InstMove motion predictor \(B=32, 128×128\) \| )\*\*[\d.]+ instance-clips/s/chip\*\*",
                 "**{v:.0f} instance-clips/s/chip**"),
}


def main():
    suite = json.load(open(os.path.join(ROOT, "BENCH_SUITE.json")))
    readme_path = os.path.join(ROOT, "README.md")
    text = open(readme_path).read()
    changed = []
    for key, (pat, fmt) in ROWS.items():
        if key not in suite:
            continue
        v = float(suite[key]["value"])
        new_text, n = re.subn(pat, lambda m: m.group(1) + fmt.format(v=v), text)
        if n != 1:
            print(f"WARNING: row for {key} matched {n} times, skipped", file=sys.stderr)
            continue
        if new_text != text:
            changed.append(key)
        text = new_text
    open(readme_path, "w").write(text)
    print(f"updated rows: {changed or 'none (already current)'}")


if __name__ == "__main__":
    main()
