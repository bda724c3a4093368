// Native reference implementations of the resampling schemes.
//
// The upstream reference (TuringLang/AdvancedPS.jl) is pure Julia with no native
// code; these C++ implementations serve as an *independent oracle* for the
// vectorised JAX resamplers (advancedps_tpu/resampling.py) — the same sequential
// CDF-inversion algorithms, written directly from their definitions
// (/root/reference/src/resampling.jl documents the math; this is a clean-room
// reimplementation of the standard published algorithms, cf. Douc, Cappé &
// Moulines 2005, arXiv:cs/0507025).
//
// All functions are RNG-agnostic: uniforms are inputs, so a test can feed the
// same uniforms to both implementations and compare outputs exactly.
//
// Build:  g++ -O2 -shared -fPIC -o libaps_native.so resampling.cpp

#include <cmath>
#include <cstdint>

extern "C" {

// Systematic: positions (u + k) / n walked against the weight CDF.
// out[k] = j  iff  sum(w[0..j-1]) <= (u+k)/n < sum(w[0..j]).
void aps_systematic(float u, const float* w, int64_t m, int64_t n, int32_t* out) {
  double cum = static_cast<double>(w[0]);
  int64_t j = 0;
  for (int64_t k = 0; k < n; ++k) {
    const double pos = (static_cast<double>(u) + k) / static_cast<double>(n);
    while (cum <= pos && j + 1 < m) {
      ++j;
      cum += static_cast<double>(w[j]);
    }
    out[k] = static_cast<int32_t>(j);
  }
}

// Stratified: position k uses its own uniform, (us[k] + k) / n.
void aps_stratified(const float* us, const float* w, int64_t m, int64_t n,
                    int32_t* out) {
  double cum = static_cast<double>(w[0]);
  int64_t j = 0;
  for (int64_t k = 0; k < n; ++k) {
    const double pos = (static_cast<double>(us[k]) + k) / static_cast<double>(n);
    while (cum <= pos && j + 1 < m) {
      ++j;
      cum += static_cast<double>(w[j]);
    }
    out[k] = static_cast<int32_t>(j);
  }
}

// Single categorical draw by CDF inversion (the reference's randcat).
static int64_t inverse_cdf(double pos, const float* w, int64_t m) {
  double cum = static_cast<double>(w[0]);
  int64_t j = 0;
  while (cum <= pos && j + 1 < m) {
    ++j;
    cum += static_cast<double>(w[j]);
  }
  return j;
}

// Multinomial: n independent categorical draws.
void aps_multinomial(const float* us, const float* w, int64_t m, int64_t n,
                     int32_t* out) {
  for (int64_t k = 0; k < n; ++k) {
    out[k] = static_cast<int32_t>(inverse_cdf(us[k], w, m));
  }
}

// Residual: floor(n*w_j) deterministic copies, remainder multinomial on the
// residual weights.  us supplies uniforms for the residual draws (length n;
// only the tail past the deterministic copies is consumed).
void aps_residual(const float* us, const float* w, int64_t m, int64_t n,
                  int32_t* out) {
  int64_t filled = 0;
  double* residual = new double[m];
  double res_total = 0.0;
  for (int64_t j = 0; j < m; ++j) {
    const double x = static_cast<double>(n) * static_cast<double>(w[j]);
    const int64_t copies = static_cast<int64_t>(std::floor(x));
    for (int64_t c = 0; c < copies && filled < n; ++c) out[filled++] = j;
    residual[j] = x - static_cast<double>(copies);
    res_total += residual[j];
  }
  for (int64_t k = filled; k < n; ++k) {
    const double pos = static_cast<double>(us[k]) * res_total;
    double cum = residual[0];
    int64_t j = 0;
    while (cum <= pos && j + 1 < m) {
      ++j;
      cum += residual[j];
    }
    out[k] = static_cast<int32_t>(j);
  }
  delete[] residual;
}

// Full sequential bootstrap-filter sweep for the scalar LGSSM — the native
// single-core baseline used by bench.py (the closest analogue of the
// reference's single-process sweep loop).  Returns log-evidence.
// xs_noise / obs are precomputed standard-normal draws and observations.
double aps_lgssm_sweep(const float* obs, const float* init_noise,
                       const float* step_noise, const float* res_uniforms,
                       int64_t n, int64_t T, float a, float q, float r,
                       float sigma0, float ess_threshold) {
  double* x = new double[n];
  double* logw = new double[n];
  double* wn = new double[n];
  int32_t* anc = new int32_t[n];
  double* xtmp = new double[n];
  const double log_norm = -0.5 * std::log(2.0 * M_PI);
  double log_z = 0.0;

  for (int64_t i = 0; i < n; ++i) {
    x[i] = static_cast<double>(init_noise[i]) * sigma0;
    const double z = (obs[0] - x[i]) / r;
    logw[i] = -0.5 * z * z - std::log(static_cast<double>(r)) + log_norm;
  }
  {  // t = 0 evidence contribution: logsumexp(logw) - log n
    double mx0 = logw[0];
    for (int64_t i = 1; i < n; ++i) mx0 = std::max(mx0, logw[i]);
    double s0 = 0.0;
    for (int64_t i = 0; i < n; ++i) s0 += std::exp(logw[i] - mx0);
    log_z = mx0 + std::log(s0) - std::log(static_cast<double>(n));
  }

  for (int64_t t = 1; t < T; ++t) {
    // normalise, ESS
    double mx = logw[0];
    for (int64_t i = 1; i < n; ++i) mx = std::max(mx, logw[i]);
    double s = 0.0;
    for (int64_t i = 0; i < n; ++i) s += std::exp(logw[i] - mx);
    double ss = 0.0;
    for (int64_t i = 0; i < n; ++i) {
      wn[i] = std::exp(logw[i] - mx) / s;
      ss += wn[i] * wn[i];
    }
    const double ess = 1.0 / ss;
    if (ess <= ess_threshold * static_cast<double>(n)) {
      float wnf_u = res_uniforms[t];
      // systematic resample on normalised weights
      double cum = wn[0];
      int64_t j = 0;
      for (int64_t k = 0; k < n; ++k) {
        const double pos = (static_cast<double>(wnf_u) + k) / static_cast<double>(n);
        while (cum <= pos && j + 1 < n) {
          ++j;
          cum += wn[j];
        }
        anc[k] = static_cast<int32_t>(j);
      }
      for (int64_t k = 0; k < n; ++k) xtmp[k] = x[anc[k]];
      for (int64_t k = 0; k < n; ++k) {
        x[k] = xtmp[k];
        logw[k] = 0.0;
      }
    }
    // logZ bookkeeping: logsumexp before
    double mx0 = logw[0];
    for (int64_t i = 1; i < n; ++i) mx0 = std::max(mx0, logw[i]);
    double s0 = 0.0;
    for (int64_t i = 0; i < n; ++i) s0 += std::exp(logw[i] - mx0);
    const double lz0 = mx0 + std::log(s0);
    // propagate + score
    for (int64_t i = 0; i < n; ++i) {
      x[i] = a * x[i] + q * static_cast<double>(step_noise[(t - 1) * n + i]);
      const double z = (obs[t] - x[i]) / r;
      logw[i] += -0.5 * z * z - std::log(static_cast<double>(r)) + log_norm;
    }
    double mx1 = logw[0];
    for (int64_t i = 1; i < n; ++i) mx1 = std::max(mx1, logw[i]);
    double s1 = 0.0;
    for (int64_t i = 0; i < n; ++i) s1 += std::exp(logw[i] - mx1);
    log_z += (mx1 + std::log(s1)) - lz0;
  }
  delete[] x;
  delete[] logw;
  delete[] wn;
  delete[] anc;
  delete[] xtmp;
  return log_z;
}

}  // extern "C"
