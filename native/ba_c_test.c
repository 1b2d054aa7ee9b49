#include <stdio.h>
#include <stdlib.h>

void *ba_optimizer_create(int);
int ba_optimizer_add_cam_vertex(void*, long, const double*, const double*, const double*);
int ba_optimizer_add_xyz_vertex(void*, long, const double*);
int ba_optimizer_add_p2c_edge(void*, long, long, const double*, const double*);
double ba_optimizer_optimize(void*, int);
double ba_optimizer_chi2(void*);
int ba_optimizer_vertex_state(void*, long, double*, int);
void ba_optimizer_destroy(void*);

int main(void) {
    void *opt = ba_optimizer_create(1);
    if (!opt) { fprintf(stderr, "create failed\n"); return 1; }
    double q[4] = {0, 0, 0, 1};
    double intr[5] = {500, 500, 320, 240, 0};
    for (long c = 0; c < 4; ++c) {
        double pos[3] = {0.3 * c, 0.05 * c, 0};
        if (!ba_optimizer_add_cam_vertex(opt, c, pos, q, intr)) return 2;
    }
    double info[4] = {1, 0, 0, 1};
    long nv = 4;
    for (int i = 0; i < 40; ++i) {
        double pt[3] = {0.1 * (i % 10) - 0.5, 0.1 * (i / 10) - 0.2, 5.0 + 0.01 * i};
        double noisy[3] = {pt[0] + 0.03 * ((i * 7 % 11) - 5) / 5.0, pt[1], pt[2]};
        if (!ba_optimizer_add_xyz_vertex(opt, nv, noisy)) return 3;
        for (long c = 0; c < 4; ++c) {
            double x = pt[0] - 0.3 * c, y = pt[1] - 0.05 * c, z = pt[2];
            double uv[2] = {500 * x / z + 320, 500 * y / z + 240};
            if (!ba_optimizer_add_p2c_edge(opt, nv, c, uv, info)) return 4;
        }
        nv++;
    }
    double chi0 = ba_optimizer_chi2(opt);
    double chi2 = ba_optimizer_optimize(opt, 5);
    double st[3];
    int m = ba_optimizer_vertex_state(opt, 4, st, 3);
    printf("chi0=%.4f chi2=%.6f state_len=%d\n", chi0, chi2, m);
    ba_optimizer_destroy(opt);
    if (!(chi2 >= 0 && chi2 < chi0 * 0.01 + 1e-6)) {
        fprintf(stderr, "no convergence: %f -> %f\n", chi0, chi2);
        return 5;
    }
    printf("C API OK\n");
    return 0;
}
