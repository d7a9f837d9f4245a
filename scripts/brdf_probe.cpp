// Probe: evaluate IrregIsotropicBRDF via the real KdTree, bypassing Material.
#define private public
#include "pbrt.h"
#include "spectrum.h"
#include "reflection.h"
#include "texture.h"
#include "materials/measured.h"
#undef private
#include <cstdio>
int main() {
    SampledSpectrum::Init();
    Reference<Texture<float> > bump;
    Reference<Texture<Spectrum> > normal;
    MeasuredMaterial *mat = new MeasuredMaterial(
        "/root/reference/scenes/brdfs/mystique.brdf", bump, normal);
    IrregIsotropicBRDF brdf(mat->thetaPhiData);
    float dirs[][4] = {
        {0.3f, 0.0f, 0.5f, 1.0f}, {0.7f, 0.5f, 0.7f, 3.64f},
        {1.2f, 0.0f, 1.2f, 3.14159f}, {0.1f, 0.0f, 0.1f, 0.0f},
        {0.9f, 2.0f, 0.4f, 5.0f}, {1.4f, 0.2f, 1.4f, 3.3f},
        {0.5f, 1.0f, 0.5f, 4.14159f}, {1.0f, 0.0f, 1.0f, 3.14159f},
    };
    for (auto& d : dirs) {
        Vector wo(sinf(d[0])*cosf(d[1]), sinf(d[0])*sinf(d[1]), cosf(d[0]));
        Vector wi(sinf(d[2])*cosf(d[3]), sinf(d[2])*sinf(d[3]), cosf(d[2]));
        Spectrum f = brdf.f(wo, wi);
        printf("f %g %g %g %g :", d[0], d[1], d[2], d[3]);
        for (int k=0;k<nSpectralSamples;k++) printf(" %.6g", f.getSpectrum(k));
        printf("\n");
    }
    return 0;
}
