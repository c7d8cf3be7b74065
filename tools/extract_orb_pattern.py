"""Extract the canonical 256-pair BRIEF sampling pattern (OpenCV's learned
`bit_pattern_31_`, BSD-licensed constant data) from the reference source into
a .npy data file. Run once; the output is committed.

Usage: python tools/extract_orb_pattern.py
"""
import re
from pathlib import Path

import numpy as np

SRC = Path("/root/reference/src/ORBextractor.cc")
OUT = Path(__file__).resolve().parent.parent / "orbslam_birdview_tpu" / "frontend" / "orb_pattern.npy"


def main():
    text = SRC.read_text()
    start = text.index("bit_pattern_31_")
    start = text.index("{", start)
    end = text.index("};", start)
    body = text[start + 1 : end]
    # strip /*comments*/ and collect integers
    body = re.sub(r"/\*.*?\*/", "", body)
    nums = [int(tok) for tok in re.findall(r"-?\d+", body)]
    assert len(nums) == 256 * 4, len(nums)
    arr = np.array(nums, dtype=np.int32).reshape(256, 4)  # x1,y1,x2,y2
    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.save(OUT, arr)
    print(f"wrote {OUT} shape={arr.shape} range=[{arr.min()},{arr.max()}]")


if __name__ == "__main__":
    main()
