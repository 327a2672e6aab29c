/* Golden-value generator: compiles the reference RFM Voigt routine and dumps
 * profile values for a sweep of (lorentz, doppler, window) configurations.
 * Output: one line per value, "%.9e".  Used only to produce committed test
 * fixtures — not part of the shipped framework. */
#include <stdio.h>
#include <stdlib.h>

#include "RFM_voigt.c"

int main(void)
{
    /* (line_center, lorentz_hwhm, doppler_hwhm, w_start, wres, npoints) */
    double configs[][6] = {
        /* tropospheric strong line, 0.1 cm-1 grid, +-25 cm-1 window */
        {1000.0, 0.08, 0.0015, 975.0, 0.1, 501},
        /* stratospheric narrow line (doppler-dominated) */
        {1500.3, 0.002, 0.003, 1490.0, 0.01, 2001},
        /* very pressure-broadened (lorentz limit trigger, y >= 70.55) */
        {500.0, 5.0, 0.0005, 480.0, 0.5, 81},
        /* tiny y (pure doppler regions) */
        {3000.7, 1.0e-7, 0.004, 2995.0, 0.05, 201},
        /* mid y, wide window to cover all humlicek regions */
        {2000.0, 0.03, 0.002, 1975.0, 0.05, 1001},
        /* shortwave high wavenumber */
        {20000.0, 0.06, 0.02, 19990.0, 1.0, 21},
    };
    int nconf = sizeof(configs) / sizeof(configs[0]);
    int c;
    for (c = 0; c < nconf; ++c)
    {
        LineShapeInputs_t in;
        in.line_center = configs[c][0];
        in.lorentz_hwhm = configs[c][1];
        in.doppler_hwhm = configs[c][2];
        in.w = configs[c][3];
        in.wres = configs[c][4];
        in.num_wpoints = (uint64_t)configs[c][5];
        fp_t *k = (fp_t *)malloc(sizeof(fp_t) * in.num_wpoints);
        rfm_voigt_line_shape(in, k);
        uint64_t i;
        for (i = 0; i < in.num_wpoints; ++i)
        {
            printf("%.9e\n", (double)k[i]);
        }
        free(k);
    }
    return 0;
}
