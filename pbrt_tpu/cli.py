"""Command-line entry point.

Reference: src/main/pbrt.cpp — flags --ncores, --outfile, --quick, --quiet,
--verbose (pbrt.cpp:36-48). ``--ncores`` maps to the device-mesh size here.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="pbrt_tpu", description="TPU-native spectral renderer (pbrt-v2-spectral capability parity)"
    )
    ap.add_argument("scene", help=".pbrt scene file")
    ap.add_argument("--outfile", default=None, help="override output filename")
    ap.add_argument("--quick", action="store_true", help="render with 1 spp")
    ap.add_argument("--quiet", action="store_true")
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--spp", type=int, default=None, help="override pixelsamples")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--ndevices", type=int, default=None,
                    help="shard the render over N devices (default: all)")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--distributed", nargs="?", const="", default=None,
                    metavar="COORDINATOR",
                    help="multi-host: jax.distributed.initialize; optional "
                    "coordinator host:port (auto-detected on TPU pods). "
                    "Combine with --num-processes/--process-id off-pod")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args(argv)

    from pbrt_tpu.utils import error as err

    err.set_options(quiet=args.quiet, verbose=args.verbose)

    if args.distributed is not None:
        from pbrt_tpu.parallel.shard import init_distributed

        rank, world = init_distributed(
            args.distributed or None, args.num_processes, args.process_id
        )
        if not args.quiet:
            print(f"[pbrt_tpu] distributed: process {rank}/{world}")

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    from pbrt_tpu.film import film as film_mod
    from pbrt_tpu.renderers.sampler import render
    from pbrt_tpu.renderers.dispatch import render_scene
    from pbrt_tpu.scene.api import load_scene
    from pbrt_tpu.scene.builder import build

    t0 = time.time()
    desc = load_scene(args.scene)
    built = build(desc)
    if not args.quiet:
        g = built.scene.geometry
        print(
            f"[pbrt_tpu] scene: {g.num_triangles} tris, {g.num_quadrics} quadrics, "
            f"{built.scene.lights.count} lights, "
            f"{built.scene.materials.count} materials "
            f"(build {time.time()-t0:.2f}s)"
        )
    outputs = render_scene(
        built,
        spp=args.spp,
        seed=args.seed,
        quick=args.quick,
        verbose=not args.quiet,
        outfile=args.outfile,
    )
    if not args.quiet:
        for path in outputs:
            print(f"[pbrt_tpu] wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
