/* probe the reference's nn-table interpolation for NaN coverage */
#include <stdio.h>
#include <math.h>
#include <stdlib.h>
#include "mpi.h"
typedef struct { double x, y, z; } point;
typedef struct {
    double xmin, xmax, ymin, ymax;
    point *points;
    int npoints;
    void *d;
    void *interpolator;
} nn_interp;
extern int nn_read_table(nn_interp *nn, const char *fname);
extern void lpi_interpolate_point(void *lpi, point *p);
int myid = 0, num_cpus = 1;
MPI_Comm cpugrid = 0;
char progname[256] = "nnprobe";
void imderror(char *msg) { fprintf(stderr, "error: %s\n", msg); }
void error_str(char *fmt, char *s) { fprintf(stderr, fmt, s); }
void error_str_str(char *fmt, char *a, char *b) { (void)fmt; (void)a; (void)b; }
int main(int argc, char **argv) {
    nn_interp t;
    MPI_Init(&argc, &argv);
    nn_read_table(&t, argv[1]);
    printf("loaded %d pts x[%g %g] y[%g %g]\n", t.npoints,
           t.xmin, t.xmax, t.ymin, t.ymax);
    int nan = 0, tot = 0;
    for (double x = t.xmin; x <= t.xmax; x += (t.xmax-t.xmin)/97.0)
        for (double y = t.ymin; y <= t.ymax; y += (t.ymax-t.ymin)/89.0) {
            point p = {x, y, 0};
            lpi_interpolate_point(t.interpolator, &p);
            tot++;
            if (isnan(p.z)) { if (nan < 5) printf("NaN at %g %g\n", x, y); nan++; }
        }
    printf("NaN %d / %d\n", nan, tot);
    if (argc > 3) {
        point p = {atof(argv[2]), atof(argv[3]), 0};
        lpi_interpolate_point(t.interpolator, &p);
        printf("probe(%g, %g) = %.10e\n", p.x, p.y, p.z);
    }
    return 0;
}
/* second entry: probe a specific point given x y on argv[2,3] */
