// Probe: print the reference's binned FromRGB spectra + CIE tables for parity checks.
#include "pbrt.h"
#include "spectrum.h"
#include <cstdio>
int main(int argc, char** argv) {
    SampledSpectrum::Init();
    float rgbs[][3] = {{1,1,1},{0.5,0.2,0.8},{0.9,0.1,0.1},{0.1,0.9,0.1},
                       {0.1,0.1,0.9},{0.2,0.7,0.4},{0.25,0.25,0.25},{1,0.6,0.2}};
    for (auto& rgb : rgbs) {
        SampledSpectrum r = SampledSpectrum::FromRGB(rgb, SPECTRUM_REFLECTANCE);
        SampledSpectrum i = SampledSpectrum::FromRGB(rgb, SPECTRUM_ILLUMINANT);
        printf("refl %g %g %g :", rgb[0], rgb[1], rgb[2]);
        for (int k=0;k<nSpectralSamples;k++) printf(" %.8g", r.getSpectrum(k));
        printf("\nillum %g %g %g :", rgb[0], rgb[1], rgb[2]);
        for (int k=0;k<nSpectralSamples;k++) printf(" %.8g", i.getSpectrum(k));
        printf("\n");
        float out[3]; r.ToRGB(out);
        printf("toRGB %g %g %g : %.8g %.8g %.8g\n", rgb[0],rgb[1],rgb[2], out[0],out[1],out[2]);
    }
    return 0;
}
