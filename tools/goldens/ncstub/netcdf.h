/* Minimal netCDF API stub for compiling the UNMODIFIED reference cloud
 * sources (cloud_pade_optics.c includes netcdf.h for its table loader,
 * construct_cloud_optics) in an environment without libnetcdf headers.
 * The golden harness builds ty_cloud_optics directly from text tables and
 * NEVER calls the loader, so every stub simply fails loudly if reached.
 */
#ifndef NETCDF_STUB_H_
#define NETCDF_STUB_H_

#include <stdio.h>
#include <stdlib.h>

#define NC_NOERR 0
#define NC_NOWRITE 0
#define NC_GLOBAL (-1)

typedef int nc_type;
#define NC_INT 4
#define NC_FLOAT 5
#define NC_DOUBLE 6

static int nc_stub_fail(const char *fn)
{
    fprintf(stderr, "netcdf stub: %s called (loader path must not run)\n",
            fn);
    exit(1);
}

static inline int nc_open(const char *p, int m, int *id)
{ (void)p; (void)m; (void)id; return nc_stub_fail("nc_open"); }
static inline int nc_close(int id)
{ (void)id; return nc_stub_fail("nc_close"); }
static inline const char *nc_strerror(int e)
{ (void)e; return "netcdf stub"; }
static inline int nc_inq_dimid(int id, const char *n, int *d)
{ (void)id; (void)n; (void)d; return nc_stub_fail("nc_inq_dimid"); }
static inline int nc_inq_dimlen(int id, int d, size_t *l)
{ (void)id; (void)d; (void)l; return nc_stub_fail("nc_inq_dimlen"); }
static inline int nc_inq_varid(int id, const char *n, int *v)
{ (void)id; (void)n; (void)v; return nc_stub_fail("nc_inq_varid"); }
static inline int nc_get_var_float(int id, int v, float *b)
{ (void)id; (void)v; (void)b; return nc_stub_fail("nc_get_var_float"); }
static inline int nc_get_var_double(int id, int v, double *b)
{ (void)id; (void)v; (void)b; return nc_stub_fail("nc_get_var_double"); }
static inline int nc_get_var_int(int id, int v, int *b)
{ (void)id; (void)v; (void)b; return nc_stub_fail("nc_get_var_int"); }
static inline int nc_get_att_text(int id, int v, const char *n, char *b)
{ (void)id; (void)v; (void)n; (void)b;
  return nc_stub_fail("nc_get_att_text"); }

#endif
