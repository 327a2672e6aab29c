/* Golden-value generator for the reference shortwave solver.
 *
 * Compiles the unmodified reference shortwave/src/shortwave.c and drives the
 * static sw_flux routine (delta-Eddington + Meador-Weaver + adding) over
 * synthetic columns, dumping per-level up/down fluxes ("%.9e").
 *
 * Build:
 *   gcc -I/root/reference/utilities/src -I/root/reference/shortwave/src \
 *       -o sw_harness sw_harness.c /root/reference/utilities/src/verbosity.c -lm
 */
#include <stdio.h>

#include "shortwave.c"

static void run_case(int nlevels, fp_t mu_dir, fp_t mu_dif, fp_t a_dir,
                     fp_t a_dif, fp_t tau_scale, fp_t omega_base, fp_t g_base,
                     int nw)
{
    int nlayers = nlevels - 1;
    fp_t omega[64], g[64], tau[64];
    int i, k;
    for (k = 0; k < nw; ++k)
    {
        fp_t flux_up[64], flux_down[64];
        for (i = 0; i < nlayers; ++i)
        {
            tau[i] = tau_scale * (0.3 + 0.7 * ((i + k) % 5) / 4.0);
            omega[i] = omega_base * (0.5 + 0.5 * ((i * 3 + k) % 7) / 6.0);
            if (omega[i] > 1.) omega[i] = 1.;
            g[i] = g_base * ((i + 2 * k) % 4) / 3.0;
        }
        sw_flux(nlevels, omega, g, tau, mu_dir, mu_dif, a_dir, a_dif,
                (fp_t)1.0, flux_up, flux_down);
        for (i = 0; i < nlevels; ++i)
        {
            printf("%.9e\n%.9e\n", (double)flux_up[i], (double)flux_down[i]);
        }
    }
}

int main(void)
{
    grtcode_set_verbosity(0);
    /* scattering atmosphere, mixed omega/g */
    run_case(11, 0.66277427, 0.5, 0.3, 0.25, 0.8, 0.9, 0.85, 10);
    /* absorbing (low omega) */
    run_case(8, 0.9, 0.5, 0.1, 0.1, 2.0, 0.2, 0.4, 6);
    /* conservative scattering (omega == 1) */
    run_case(6, 0.4, 0.5, 0.5, 0.45, 1.2, 1.0, 0.7, 6);
    /* optically thick */
    run_case(9, 0.7, 0.5, 0.2, 0.2, 50.0, 0.95, 0.8, 4);
    /* nearly transparent */
    run_case(12, 0.55, 0.5, 0.6, 0.55, 1e-7, 0.5, 0.3, 4);
    /* zero scattering (omega == 0) */
    run_case(7, 0.8, 0.5, 0.25, 0.2, 1.5, 0.0, 0.0, 4);
    return 0;
}
