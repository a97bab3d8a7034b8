/* auto-generated nonlinear MPC: single-shooting Gauss-Newton SQP
 * with FISTA box-QP subproblems. Model: 'CSTR'. */
#include <math.h>

#define NX 2
#define NU 1
#define NH 12
#define NUVEC 12
#define SQP_ITERS 12
#define FGM_ITERS 200
static const double DT = 0.10000000000000001;
static const double P_VALS[6] = {1, 1, 1, 1, 1, 1};
static const double Q_W[4] = {10, 0, 0, 10};
static const double R_W[1] = {0.10000000000000001};
static const double P_W[4] = {0, 0, 0, 0};
static const double X_REF[2] = {0.29999999999999999, 0.18054999999999999};
static const double U_REF[1] = {0};
static const double XT_REF[2] = {0, 0};
static const double U_LB1[1] = {-5};
static const double U_UB1[1] = {5};

static double hilo_sign(double v) { return v > 0 ? 1.0 : (v < 0 ? -1.0 : 0.0); }

static void model_rhs(const double *x, const double *u, double t, double *dx) {
    const double aux_r = ((1.0 - x[0]) * exp(((-P_VALS[5]) / (1.0 + x[1]))));
    dx[0] = (((-P_VALS[0]) * x[0]) + (P_VALS[1] * aux_r));
    dx[1] = ((((-P_VALS[2]) * x[1]) + (P_VALS[3] * aux_r)) + (P_VALS[4] * u[0]));
}

/* one integration interval */
static void step_f(const double *x, const double *u, double t, double *xn) {
    double k1[NX], k2[NX], k3[NX], k4[NX], tmp[NX];
    model_rhs(x, u, t, k1);
    for (int i = 0; i < NX; ++i) tmp[i] = x[i] + 0.5 * DT * k1[i];
    model_rhs(tmp, u, t + 0.5 * DT, k2);
    for (int i = 0; i < NX; ++i) tmp[i] = x[i] + 0.5 * DT * k2[i];
    model_rhs(tmp, u, t + 0.5 * DT, k3);
    for (int i = 0; i < NX; ++i) tmp[i] = x[i] + DT * k3[i];
    model_rhs(tmp, u, t + DT, k4);
    for (int i = 0; i < NX; ++i)
        xn[i] = x[i] + DT / 6.0 * (k1[i] + 2.0 * k2[i] + 2.0 * k3[i] + k4[i]);
}

/* central-difference stage Jacobians A = dF/dx, B = dF/du */
static void stage_jac(const double *x, const double *u, double t,
                      double *A, double *B) {
    double xp[NX], xm[NX], fp[NX], fm[NX], up[NU], um[NU];
    for (int j = 0; j < NX; ++j) {
        double h = 1e-6 * (1.0 + fabs(x[j]));
        for (int i = 0; i < NX; ++i) { xp[i] = x[i]; xm[i] = x[i]; }
        xp[j] += h; xm[j] -= h;
        step_f(xp, u, t, fp); step_f(xm, u, t, fm);
        for (int i = 0; i < NX; ++i) A[i * NX + j] = (fp[i] - fm[i]) / (2.0 * h);
    }
    for (int j = 0; j < NU; ++j) {
        double h = 1e-6 * (1.0 + fabs(u[j]));
        for (int i = 0; i < NU; ++i) { up[i] = u[i]; um[i] = u[i]; }
        up[j] += h; um[j] -= h;
        step_f(x, up, t, fp); step_f(x, um, t, fm);
        for (int i = 0; i < NX; ++i) B[i * NU + j] = (fp[i] - fm[i]) / (2.0 * h);
    }
}

static double U_seq[NUVEC];

void nmpc_init(void) { for (int i = 0; i < NUVEC; ++i) U_seq[i] = 0.0; }

/* predicted trajectory of the last accepted iterate (NH+1 states) */
static double X_pred[(NH + 1) * NX];
const double *nmpc_prediction(void) { return X_pred; }

void nmpc_step(const double *x0, double *u_out) {
    static double S[NX * NUVEC];      /* sensitivities dx_k/dU */
    static double H[NUVEC * NUVEC], g[NUVEC];
    static double A[NX * NX], B[NX * NU];
    double x[NX], xn[NX];

    for (int sqp = 0; sqp < SQP_ITERS; ++sqp) {
        for (int i = 0; i < NUVEC * NUVEC; ++i) H[i] = 0.0;
        for (int i = 0; i < NUVEC; ++i) g[i] = 0.0;
        for (int i = 0; i < NX * NUVEC; ++i) S[i] = 0.0;
        for (int i = 0; i < NX; ++i) x[i] = x0[i];
        for (int i = 0; i < NX; ++i) X_pred[i] = x0[i];
        double t = 0.0;
        for (int k = 0; k < NH; ++k) {
            const double *uk = &U_seq[k * NU];
            /* input-cost contribution of stage k */
            for (int i = 0; i < NU; ++i) {
                double acc = 0.0;
                for (int j = 0; j < NU; ++j)
                    acc += R_W[i * NU + j] * (uk[j] - U_REF[j]);
                g[k * NU + i] += 2.0 * acc;
                for (int j = 0; j < NU; ++j)
                    H[(k * NU + i) * NUVEC + (k * NU + j)] += 2.0 * R_W[i * NU + j];
            }
            /* advance sensitivities and state */
            stage_jac(x, uk, t, A, B);
            step_f(x, uk, t, xn);
            /* S <- A S ; S[:, k] += B */
            static double Snew[NX * NUVEC];
            for (int i = 0; i < NX; ++i)
                for (int c = 0; c < NUVEC; ++c) {
                    double acc = 0.0;
                    for (int j = 0; j < NX; ++j)
                        acc += A[i * NX + j] * S[j * NUVEC + c];
                    Snew[i * NUVEC + c] = acc;
                }
            for (int i = 0; i < NX; ++i)
                for (int j = 0; j < NU; ++j)
                    Snew[i * NUVEC + (k * NU + j)] += B[i * NU + j];
            for (int i = 0; i < NX * NUVEC; ++i) S[i] = Snew[i];
            for (int i = 0; i < NX; ++i) x[i] = xn[i];
            for (int i = 0; i < NX; ++i) X_pred[(k + 1) * NX + i] = x[i];
            t += DT;
            /* state-cost contribution of x_{k+1} (terminal handled below) */
            const double *W = (k + 1 == NH) ? P_W : Q_W;
            const double *xr = (k + 1 == NH) ? XT_REF : X_REF;
            double Wdx[NX];
            for (int i = 0; i < NX; ++i) {
                double acc = 0.0;
                for (int j = 0; j < NX; ++j) acc += W[i * NX + j] * (x[j] - xr[j]);
                Wdx[i] = acc;
            }
            for (int c = 0; c < NUVEC; ++c) {
                double acc = 0.0;
                for (int i = 0; i < NX; ++i) acc += S[i * NUVEC + c] * Wdx[i];
                g[c] += 2.0 * acc;
            }
            /* H += 2 S^T W S (build W S once) */
            static double WS[NX * NUVEC];
            for (int i = 0; i < NX; ++i)
                for (int c = 0; c < NUVEC; ++c) {
                    double acc = 0.0;
                    for (int j = 0; j < NX; ++j)
                        acc += W[i * NX + j] * S[j * NUVEC + c];
                    WS[i * NUVEC + c] = acc;
                }
            for (int r = 0; r < NUVEC; ++r)
                for (int c = 0; c < NUVEC; ++c) {
                    double acc = 0.0;
                    for (int i = 0; i < NX; ++i)
                        acc += S[i * NUVEC + r] * WS[i * NUVEC + c];
                    H[r * NUVEC + c] += 2.0 * acc;
                }
        }
        /* Lipschitz estimate: a few power iterations on H */
        double v[NUVEC], Hv[NUVEC], L = 0.0;
        for (int i = 0; i < NUVEC; ++i) v[i] = 1.0 / (1.0 + i);
        for (int pi = 0; pi < 12; ++pi) {
            double nrm = 0.0;
            for (int r = 0; r < NUVEC; ++r) {
                double acc = 0.0;
                for (int c = 0; c < NUVEC; ++c) acc += H[r * NUVEC + c] * v[c];
                Hv[r] = acc;
            }
            for (int i = 0; i < NUVEC; ++i) nrm += Hv[i] * Hv[i];
            nrm = sqrt(nrm);
            if (nrm < 1e-300) break;
            L = nrm;
            for (int i = 0; i < NUVEC; ++i) v[i] = Hv[i] / nrm;
        }
        if (L < 1e-12) L = 1.0;
        double invL = 1.0 / (1.05 * L);
        /* FISTA on the step dU with bounds [lb - U, ub - U] */
        double dU[NUVEC], y[NUVEC], dU_prev[NUVEC];
        for (int i = 0; i < NUVEC; ++i) { dU[i] = 0.0; y[i] = 0.0; dU_prev[i] = 0.0; }
        double tk = 1.0;
        for (int it = 0; it < FGM_ITERS; ++it) {
            for (int r = 0; r < NUVEC; ++r) {
                double grad = g[r];
                for (int c = 0; c < NUVEC; ++c) grad += H[r * NUVEC + c] * y[c];
                double vnew = y[r] - invL * grad;
                double lo = U_LB1[r % NU] - U_seq[r];
                double hi = U_UB1[r % NU] - U_seq[r];
                if (vnew < lo) vnew = lo;
                if (vnew > hi) vnew = hi;
                dU[r] = vnew;
            }
            double tn = 0.5 * (1.0 + sqrt(1.0 + 4.0 * tk * tk));
            for (int i = 0; i < NUVEC; ++i) {
                y[i] = dU[i] + (tk - 1.0) / tn * (dU[i] - dU_prev[i]);
                dU_prev[i] = dU[i];
            }
            tk = tn;
        }
        double step_norm = 0.0;
        for (int i = 0; i < NUVEC; ++i) {
            U_seq[i] += dU[i];
            step_norm += dU[i] * dU[i];
        }
        if (step_norm < 1e-20) break;
    }
    for (int i = 0; i < NU; ++i) u_out[i] = U_seq[i];
    /* shift for the next call (warm start) */
    for (int k = 0; k < NH - 1; ++k)
        for (int i = 0; i < NU; ++i)
            U_seq[k * NU + i] = U_seq[(k + 1) * NU + i];
}
