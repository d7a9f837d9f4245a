"""Offline tools (reference: src/tools/, 1710 LoC standalone binaries).

Usage: ``python -m pbrt_tpu.tools <tool> [args...]`` with tools:
  exrdiff   — compare two images with tolerance (tools/exrdiff.cpp:24-104)
  exravg    — print image mean (tools/exravg.cpp)
  exrtotiff — tone-map + gamma an EXR to PNG/TIFF (tools/exrtotiff.cpp)
  tifftoexr — convert LDR images to EXR (tools/tifftoexr.cpp)
  samplepat — best-candidate (Poisson) sample table generator
              (tools/samplepat.cpp)
  bsdftest  — MC hemisphere integration sanity tests of BxDF stacks
              (tools/bsdftest.cpp:52-270)
  ply2pbrt  — PLY mesh → pbrt trianglemesh (tools/ply2pbrt.c)
  datdiff   — compare two spectral .dat films (fork-native addition)
"""

from __future__ import annotations

import sys

import numpy as np


def exrdiff(argv):
    """exrdiff [-o diff.exr] [-t tolerance%] img1 img2"""
    from pbrt_tpu.film.imageio import read_image, write_image

    out = None
    tol = 0.0
    args = []
    it = iter(argv)
    for a in it:
        if a == "-o":
            out = next(it)
        elif a == "-t":
            tol = float(next(it))
        else:
            args.append(a)
    a_img = read_image(args[0]).astype(np.float64)
    b_img = read_image(args[1]).astype(np.float64)
    if a_img.shape != b_img.shape:
        print(f"images differ in shape: {a_img.shape} vs {b_img.shape}")
        return 1
    d = a_img - b_img
    denom = np.abs(b_img) + 1e-9
    rel = np.abs(d) / denom * 100.0
    n_big = int((rel > max(tol, 1e-9)).sum()) if tol > 0 else int((d != 0).sum())
    n_small = int(((d != 0) & (rel <= tol)).sum()) if tol > 0 else 0
    avg1 = a_img.mean()
    avg2 = b_img.mean()
    mse = float((d * d).mean())
    print(f"images differ: {n_big} big ({100.0*n_big/d.size:.2f}%%), "
          f"{n_small} small ({100.0*n_small/d.size:.2f}%%)")
    print(f"avg 1 = {avg1:g}, avg2 = {avg2:g} (%.2f%% delta)"
          % (100.0 * abs(avg1 - avg2) / max(abs(avg2), 1e-9)))
    print(f"MSE = {mse:g}; RMS = {np.sqrt(mse):g}")
    if out:
        write_image(out, np.abs(d).astype(np.float32))
        print(f"wrote difference image {out}")
    return 0 if n_big == 0 else 1


def exravg(argv):
    from pbrt_tpu.film.imageio import read_image

    for f in argv:
        img = read_image(f)
        print(f"{f}: avg = {img.mean():g}")
    return 0


def exrtotiff(argv):
    """exrtotiff [-scale s] [-gamma g] [-tonemap] in.exr out.{png,tiff}"""
    from pbrt_tpu.film.imageio import read_image

    scale = 1.0
    gamma = 2.2
    tonemap = False
    args = []
    it = iter(argv)
    for a in it:
        if a == "-scale":
            scale = float(next(it))
        elif a == "-gamma":
            gamma = float(next(it))
        elif a == "-tonemap":
            tonemap = True
        else:
            args.append(a)
    img = read_image(args[0]) * scale
    if tonemap:
        # simple Reinhard global operator (exrtotiff.cpp uses contrast-based)
        img = img / (1.0 + img)
    ldr = np.clip(img, 0.0, 1.0) ** (1.0 / gamma)
    from PIL import Image

    u8 = (ldr * 255).astype(np.uint8)
    Image.fromarray(u8).save(args[1])
    print(f"wrote {args[1]}")
    return 0


def tifftoexr(argv):
    from pbrt_tpu.film.imageio import read_image, write_exr

    img = read_image(argv[0])
    write_exr(argv[1], img.astype(np.float32))
    print(f"wrote {argv[1]}")
    return 0


def samplepat(argv):
    """Best-candidate (Mitchell) 2D sample table generator
    (reference: tools/samplepat.cpp). Writes a .py/.txt table."""
    n = int(argv[0]) if argv else 256
    out = argv[1] if len(argv) > 1 else "samplepat.txt"
    rng = np.random.default_rng(0)
    pts = [rng.uniform(0, 1, 2)]
    for _ in range(n - 1):
        cand = rng.uniform(0, 1, (32, 2))
        arr = np.asarray(pts)
        # toroidal distance
        d = np.abs(cand[:, None, :] - arr[None, :, :])
        d = np.minimum(d, 1.0 - d)
        dist = np.sqrt((d**2).sum(-1)).min(axis=1)
        pts.append(cand[np.argmax(dist)])
    np.savetxt(out, np.asarray(pts))
    print(f"wrote {n} best-candidate samples to {out}")
    return 0


def bsdftest(argv):
    """MC-integrate BxDF stacks over the hemisphere under uniform and
    importance sampling; prints estimates side by side
    (reference: tools/bsdftest.cpp)."""
    import jax
    import jax.numpy as jnp

    from pbrt_tpu.bsdf import bxdf
    from pbrt_tpu.config import DEFAULT_SPECTRAL

    S = DEFAULT_SPECTRAL.n_bins
    n = 1 << 16
    key = jax.random.key(0)
    wo = jnp.asarray([0.2, 0.1, 0.97])
    wo = wo / jnp.linalg.norm(wo)

    cases = {
        "lambertian(0.8)": (
            lambda wi: bxdf.lambertian_f(jnp.full(S, 0.8), wo, wi),
        ),
        "oren-nayar(0.8, sig20)": (
            lambda wi: bxdf.oren_nayar_f(jnp.full(S, 0.8), 20.0, wo, wi),
        ),
        "blinn(0.8, e=20)": (
            lambda wi: bxdf.microfacet_f(
                jnp.full(S, 0.8),
                bxdf.fresnel_dielectric(bxdf.cos_theta(wi), 1.0, 1.5)[..., None],
                20.0, wo, wi,
            ),
        ),
    }
    u = jax.random.uniform(key, (n, 2))
    for name, (f,) in cases.items():
        # uniform hemisphere
        from pbrt_tpu.core import sampling as smpm

        wi_u = smpm.uniform_sample_hemisphere(u[:, 0], u[:, 1])
        f_u = jax.vmap(f)(wi_u)
        est_u = (f_u.mean(axis=-1) * bxdf.abs_cos_theta(wi_u)).mean() * 2 * jnp.pi
        # cosine importance
        wi_c = smpm.cosine_sample_hemisphere(u[:, 0], u[:, 1])
        f_c = jax.vmap(f)(wi_c)
        est_c = (f_c.mean(axis=-1) * jnp.pi).mean()
        print(f"{name:28s} uniform: {float(est_u):.4f}  "
              f"cosine-importance: {float(est_c):.4f}")
    return 0


def ply2pbrt(argv):
    """Minimal PLY (ascii/binary_little_endian) → pbrt trianglemesh."""
    path = argv[0]
    out = argv[1] if len(argv) > 1 else None
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("latin-1").strip()
            header.append(line)
            if line == "end_header":
                break
        fmt = next(l.split()[1] for l in header if l.startswith("format"))
        n_vert = int(next(l.split()[2] for l in header
                          if l.startswith("element vertex")))
        n_face = int(next(l.split()[2] for l in header
                          if l.startswith("element face")))
        props = [l.split()[2] for l in header if l.startswith("property float")
                 or l.startswith("property double")]
        if fmt == "ascii":
            verts = np.loadtxt(f, max_rows=n_vert)
            faces = []
            for _ in range(n_face):
                row = f.readline().split()
                k = int(row[0])
                poly = [int(x) for x in row[1 : 1 + k]]
                for t in range(1, k - 1):
                    faces.append((poly[0], poly[t], poly[t + 1]))
            faces = np.asarray(faces)
        else:
            vdt = np.dtype([(p, "<f4") for p in props])
            verts = np.frombuffer(f.read(n_vert * vdt.itemsize), vdt)
            verts = np.stack([verts[p] for p in props], -1)
            faces = []
            for _ in range(n_face):
                k = np.frombuffer(f.read(1), np.uint8)[0]
                poly = np.frombuffer(f.read(4 * k), "<i4")
                for t in range(1, k - 1):
                    faces.append((poly[0], poly[t], poly[t + 1]))
            faces = np.asarray(faces)
    lines = ['Shape "trianglemesh"']
    pv = " ".join(f"{v:g}" for v in np.asarray(verts)[:, :3].ravel())
    iv = " ".join(str(i) for i in faces.ravel())
    lines.append(f'  "point P" [ {pv} ]')
    lines.append(f'  "integer indices" [ {iv} ]')
    text = "\n".join(lines) + "\n"
    if out:
        with open(out, "w") as fo:
            fo.write(text)
        print(f"wrote {out} ({n_vert} verts, {len(faces)} tris)")
    else:
        sys.stdout.write(text)
    return 0


def datdiff(argv):
    """Compare two spectral .dat films (per-bin)."""
    from pbrt_tpu.film.film import read_dat

    a, _ = read_dat(argv[0])
    b, _ = read_dat(argv[1])
    if a.shape != b.shape:
        print(f"shapes differ: {a.shape} vs {b.shape}")
        return 1
    d = np.abs(a - b)
    rel = d / (np.abs(b) + 1e-9)
    print(f"max abs diff {d.max():g}, mean abs {d.mean():g}, "
          f"max rel {rel.max():g}, mean rel {rel.mean():g}")
    return 0


_TOOLS = {
    "exrdiff": exrdiff,
    "exravg": exravg,
    "exrtotiff": exrtotiff,
    "tifftoexr": tifftoexr,
    "samplepat": samplepat,
    "bsdftest": bsdftest,
    "ply2pbrt": ply2pbrt,
    "datdiff": datdiff,
}


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] not in _TOOLS:
        print(__doc__)
        return 2
    return _TOOLS[argv[0]](argv[1:])


if __name__ == "__main__":
    sys.exit(main())
