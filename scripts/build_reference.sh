#!/bin/bash
# Build the reference pbrt-v2-spectral binary out-of-tree (the reference
# checkout is read-only). Produces /root/repo/.refbuild/src/bin/pbrt.
#
# Environment quirks handled:
#  - no flex/bison installed -> use the generated pbrtlex.cpp/pbrtparse.cpp
#    shipped in the repo (touch ordering so make doesn't regenerate)
#  - no libgsl -> header-only shim in scripts/gsl_shim (RNG, bivariate
#    gaussian, Brent solver). None of the golden parity scenes use the
#    GSL-backed cameras.
#  - OpenEXR 3.1 -> Imath headers live in /usr/include/Imath and the
#    library names changed (-lOpenEXR -lImath -lIex -lIlmThread).
#  - gcc 12 -> -fpermissive + -std=gnu++14 for 2010-era C++.
set -e
REF=/root/reference/src
BUILD=/root/repo/.refbuild/src
SHIM=/root/repo/scripts/gsl_shim

rm -rf "$BUILD"
mkdir -p "$(dirname "$BUILD")"
cp -r "$REF" "$BUILD"
cd "$BUILD"

# Keep make from invoking flex/bison: generated outputs must be newer.
touch core/pbrtlex.ll core/pbrtparse.yy
sleep 0.1
touch core/pbrtlex.cpp core/pbrtparse.cpp core/pbrtparse.hpp 2>/dev/null || true
[ -f core/pbrtparse.hpp ] || cp core/pbrtparse.hh core/pbrtparse.hpp 2>/dev/null || true

# Patch the Makefile for this environment.
python3 - <<'EOF'
import re
mk = open('Makefile').read()
mk = mk.replace('LEXLIB = -lfl', 'LEXLIB =')
mk = mk.replace(
    'EXR_INCLUDES=-I/usr/local/include/OpenEXR -I/usr/include/OpenEXR -I/opt/local/include/OpenEXR',
    'EXR_INCLUDES=-I/usr/include/OpenEXR -I/usr/include/Imath')
mk = mk.replace(
    'EXRLIBS=$(EXR_LIBDIR) -Bstatic -lIex -lIlmImf -lIlmThread -lImath -lIex -lHalf -Bdynamic',
    'EXRLIBS=$(EXR_LIBDIR) -lOpenEXR -lIlmThread -lImath -lIex')
mk = mk.replace('-lgsl -lgslcblas', '')
mk = mk.replace('CXXFLAGS=$(OPT) $(MARCH) $(INCLUDE) $(WARN) $(DEFS)',
                'CXXFLAGS=$(OPT) $(MARCH) $(INCLUDE) -w -std=gnu++14 -fpermissive '
                '-I/root/repo/scripts/gsl_shim $(DEFS)')
open('Makefile','w').write(mk)
EOF

# glibc >= 2.32 removed <sys/sysctl.h>; the Linux code path never uses it.
sed -i 's@#include <sys/sysctl.h>@// shim: sysctl.h removed on modern glibc@' core/parallel.cpp

# Fork bug (crashes ss-envmap): the fork added `isect->materialId =
# material->materialId` to GeometricPrimitive::Intersect (primitive.cpp:166)
# but SurfacePointsRenderer's bounding-sphere primitive is built with a NULL
# material (surfacepoints.cpp:120 `GeometricPrimitive sphere(sph, NULL, NULL)`),
# so every dipole-subsurface render segfaults in the Poisson preprocessing.
# Null-check it; the id is never consumed for bounding-sphere hits.
sed -i 's@isect->materialId = material->materialId;@isect->materialId = material ? material->materialId : 0;@' core/primitive.cpp

mkdir -p objs bin
set -o pipefail
make -j"$(nproc)" bin/pbrt 2>&1 | tail -5
test -x bin/pbrt
echo "BUILD OK: $BUILD/bin/pbrt"
