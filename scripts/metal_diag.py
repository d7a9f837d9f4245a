"""Metal parity diagnostic: render a metal.pbrt variant on the TPU and
report per-bin mean ratios + row profile vs a reference .dat.

Usage: python scripts/metal_diag.py [spp] [out.npy] [scene] [ref.dat] [refspp]
"""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

spp = int(sys.argv[1]) if len(sys.argv) > 1 else 4
out = sys.argv[2] if len(sys.argv) > 2 else None
scene = sys.argv[3] if len(sys.argv) > 3 else "metal"
refdat = (
    sys.argv[4] if len(sys.argv) > 4
    else os.path.join(REPO, "goldens", "metal.dat")
)
refspp = float(sys.argv[5]) if len(sys.argv) > 5 else 16.0

from pbrt_tpu.film.film import read_dat  # noqa: E402
from pbrt_tpu.renderers.sampler import render  # noqa: E402
from pbrt_tpu.scene.api import load_scene  # noqa: E402
from pbrt_tpu.scene.builder import build  # noqa: E402

ref, _ = read_dat(refdat)
ref = np.asarray(ref, np.float64) / refspp

desc = load_scene(os.path.join(REPO, "goldens", f"{scene}.pbrt"))
built = build(desc)
state = render(built, spp=spp, verbose=False, diff_spp=int(refspp))
ours = (
    np.asarray(state.pixels, np.float64) + np.asarray(state.splat, np.float64)
) / spp
if out:
    np.save(out, ours)

m_ref = ref.mean((0, 1))
m_our = ours.mean((0, 1))
lit = m_ref > 1e-3 * m_ref.max()
ratio = m_our[lit] / m_ref[lit]
print("per-bin ratios (ours/ref):")
print(np.array2string(ratio, precision=3, max_line_width=100))
err = np.abs(ratio - 1.0)
print(f"max |ratio-1| = {err.max():.4f}  (tol 0.08; target 0.06)")

# row profile: luminance ratio per 16-row band
lr = ref.sum(-1).mean(1)
lo = ours.sum(-1).mean(1)
band = lambda a: a[: a.shape[0] // 16 * 16].reshape(16, -1).mean(1)
print("row-band luminance ratio (ours/ref), top->bottom:")
print(np.array2string(band(lo) / np.maximum(band(lr), 1e-9), precision=3))
