#!/bin/bash
# Render the five BASELINE parity configs with the reference binary
# (.refbuild/src/bin/pbrt, see build_reference.sh) and record wall times +
# output .dat spectral images under goldens/.
#
# Configs (BASELINE.md):
#   1. killeroo-simple  256x256, 8 spp, directlighting
#   2. metal            256x256, 16 spp, path (MLT compared separately)
#   3. bunny            256x256, 8 spp
#   4. ss-envmap        128x128, 4 spp (dipole preprocess dominates)
#   5. anim-killeroos-moving  256x256, 8 spp
# Resolutions/spp are reduced from the scene defaults so the suite renders
# in minutes; the same overrides are applied to our renderer in
# tests/test_parity.py, so the comparison is apples-to-apples.
set -e
PBRT=/root/repo/.refbuild/src/bin/pbrt
SCENES=/root/reference/scenes
OUT=/root/repo/goldens
mkdir -p "$OUT"
cd "$OUT"
# relative Include/texture paths resolve against the scene file's dir
for d in geometry textures spds brdfs; do
    [ -e "$OUT/$d" ] || ln -s "$SCENES/$d" "$OUT/$d"
done

patch_scene() {  # $1=name $2=xres $3=yres $4=spp $5=integrator-override
    python3 - "$SCENES/$1.pbrt" "$2" "$3" "$4" "$5" > "$OUT/$1.pbrt" <<'EOF'
import re, sys
path, xres, yres, spp, integ = sys.argv[1:6]
txt = open(path).read()
# Strip any uncommented resolution params, then inject ours onto the Film
# directive itself (bunny.pbrt keeps its resolution inside a comment, so a
# plain regex substitution silently no-ops — round-2 lesson).
txt = re.sub(r'(?m)^"integer xresolution" \[\d+\] *"integer yresolution" \[\d+\] *\n', '', txt)
txt = re.sub(r'"integer xresolution" \[\d+\]', '', txt)
txt = re.sub(r'"integer yresolution" \[\d+\]', '', txt)
txt = re.sub(r'Film "image"',
             f'Film "image" "integer xresolution" [{xres}] "integer yresolution" [{yres}]',
             txt, count=1)
if re.search(r'"integer pixelsamples" \[\d+\]', txt):
    txt = re.sub(r'"integer pixelsamples" \[\d+\]', f'"integer pixelsamples" [{spp}]', txt)
else:
    # bunny.pbrt has no Sampler directive at all — inject one (the r3 lesson:
    # a silent no-op here rendered the golden at the default 4 spp)
    txt = txt.replace(
        'WorldBegin',
        f'Sampler "lowdiscrepancy" "integer pixelsamples" [{spp}]\nWorldBegin', 1)
if integ != "-":
    txt = re.sub(r'Renderer "\w+"[^\n]*', '', txt)
    if re.search(r'SurfaceIntegrator "\w+"', txt):
        txt = re.sub(r'SurfaceIntegrator "\w+"', f'SurfaceIntegrator "{integ}"', txt)
    else:
        # metal.pbrt has no SurfaceIntegrator directive at all
        txt = txt.replace('WorldBegin', f'SurfaceIntegrator "{integ}"\nWorldBegin', 1)
# keep relative includes/textures resolvable: pbrt resolves relative to the
# scene file directory, so rewrite file refs to absolute where simple
txt = txt.replace('"string filename" "killeroo-simple.exr"', '"string filename" "killeroo-simple.dat"')
# metal.pbrt references textures/uffizi_latlong.exr which the repo does not
# ship; grace_latlong.exr is the one that exists
txt = txt.replace('uffizi_latlong.exr', 'grace_latlong.exr')
print(txt)
EOF
}

run_one() {  # $1=scene-base $2=ncores-override
    echo "=== $1 ==="
    local t0 t1 nc
    nc="${2:-$(nproc)}"
    t0=$(date +%s.%N)
    "$PBRT" --quiet --ncores "$nc" --outfile "$OUT/$1.dat" "$OUT/$1.pbrt" || return 1
    t1=$(date +%s.%N)
    echo "$t0 $t1" | awk '{printf "%.2f\n", $2-$1}' > "$OUT/$1.time"
    echo "$1: $(cat "$OUT/$1.time")s"
}

patch_scene killeroo-simple 256 256 8 -
patch_scene metal 256 256 16 path
patch_scene bunny 256 256 8 -
# ss-envmap at 64 spp: the scene is glint-dominated (bump-mapped glossy
# floor under the rotated bright grace env); the reference's LD-sampler
# realization at spp<=16 lands up to 2x ABOVE its own converged mean
# (measured: spp4 0.148, spp16 0.116, spp64 0.072, spp256 0.072 image
# mean) — the golden must be the converged image to be a correctness
# target.
patch_scene ss-envmap 128 128 64 -
patch_scene anim-killeroos-moving 256 256 8 -

for s in killeroo-simple metal bunny anim-killeroos-moving; do
    run_one "$s" || echo "FAILED: $s"
done
# ss-envmap needs the NULL-material fix applied by build_reference.sh (the
# fork's GeometricPrimitive::Intersect dereferences a NULL material on the
# SurfacePointsRenderer bounding sphere — segfaults unpatched). Single-core
# keeps the Poisson point set deterministic for the pinned hash.
run_one ss-envmap 1 || echo "FAILED: ss-envmap"
sha256sum "$OUT"/*.dat > "$OUT/HASHES.sha256"
ls -la "$OUT"
