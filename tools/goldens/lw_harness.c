/* Golden-value generator for the reference longwave solver.
 *
 * Compiles the unmodified reference longwave/src/longwave.c and drives the
 * static lw_flux routine over synthetic columns, dumping per-level
 * up/down fluxes ("%.9e" one per line).  Used only to produce committed
 * test fixtures.
 *
 * Build:
 *   gcc -I/root/reference/utilities/src -I/root/reference/longwave/src \
 *       -o lw_harness lw_harness.c /root/reference/utilities/src/verbosity.c -lm
 */
#include <stdio.h>

#include "longwave.c"

/* Column configs: nlevels, T_surf, emissivity, plus profile generators. */
static void run_case(int nlevels, fp_t t_surf, fp_t emis, fp_t t_top,
                     fp_t t_bottom, fp_t tau_scale, double w0, double dw,
                     int nw)
{
    int nlayers = nlevels - 1;
    fp_t t_layers[64], t_levels[64], tau[64];
    int i, k;
    for (i = 0; i < nlevels; ++i)
    {
        t_levels[i] = t_top + (t_bottom - t_top) * i / (fp_t)(nlevels - 1);
    }
    for (i = 0; i < nlayers; ++i)
    {
        t_layers[i] = 0.5 * (t_levels[i] + t_levels[i + 1]);
    }
    for (k = 0; k < nw; ++k)
    {
        double w = w0 + k * dw;
        fp_t flux_up[64], flux_down[64];
        for (i = 0; i < nlayers; ++i)
        {
            /* wavenumber- and layer-dependent synthetic optical depth */
            tau[i] = tau_scale * (0.5 + 0.5 * sin(0.01 * w + i)) *
                     (i + 1) / (fp_t)nlayers;
            if (tau[i] < 0.) tau[i] = 0.;
        }
        lw_flux(nlevels, (fp_t)w, t_surf, t_layers, t_levels, tau, emis,
                flux_up, flux_down);
        for (i = 0; i < nlevels; ++i)
        {
            printf("%.9e\n%.9e\n", (double)flux_up[i], (double)flux_down[i]);
        }
    }
}

int main(void)
{
    grtcode_set_verbosity(0);
    /* moderate optical depth, gray-ish emissivity */
    run_case(11, 294.2, 0.98, 210.0, 290.0, 1.7, 200.0, 250.0, 12);
    /* optically thick */
    run_case(8, 300.0, 1.0, 230.0, 299.0, 80.0, 500.0, 100.0, 8);
    /* optically thin */
    run_case(21, 288.0, 0.9, 200.0, 287.0, 1e-6, 900.0, 300.0, 6);
    /* reflective surface (low emissivity) */
    run_case(5, 265.0, 0.35, 215.0, 260.0, 0.6, 1200.0, 400.0, 5);
    return 0;
}
