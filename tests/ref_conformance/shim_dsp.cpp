// C ABI shim over the reference DSP classes for conformance testing
#include "BiQuad.h"
#include "FractionalSample.h"
#include "AllPassFilter.h"
USE_BBC_AUDIOTOOLBOX

extern "C" {

// RBJ coefficient design (ref: BiQuadCoeffs::CalcCoeffs)
void ref_biquad_coeffs(int type, double freq, double fs, double gain,
                       double bandwidth, double* out5) {
  BiQuadCoeffs c;
  c.CalcCoeffs((BiQuadCoeffs::Filter_t)type, freq, fs, gain, bandwidth, 0.0);
  out5[0] = c.current.num0;
  out5[1] = c.current.num1;
  out5[2] = c.current.num2;
  out5[3] = c.current.den1;
  out5[4] = c.current.den2;
}

// Single-biquad block process (ref: BiQuad::Process + DF2T tick)
void ref_biquad_process(const double* coeffs5, const float* x, float* y,
                        unsigned n) {
  BiQuadCoeffs c;
  c.SetCoeffs(coeffs5[0], coeffs5[1], coeffs5[2], coeffs5[3], coeffs5[4], 0.0);
  BiQuad f(c);
  for (unsigned i = 0; i < n; i++) y[i] = f.Process(x[i]);
}

// Interpolated coefficient ramp (ref: BiQuad static Process with
// per-frame Interpolate, BiQuad.cpp:473-494)
void ref_biquad_process_interp(const double* c_old5, const double* c_new5,
                               double interp_samples, const float* x,
                               float* y, unsigned n) {
  BiQuadCoeffs c;
  c.SetCoeffs(c_old5[0], c_old5[1], c_old5[2], c_old5[3], c_old5[4], 0.0);
  BiQuad f(c);
  c.SetCoeffs(c_new5[0], c_new5[1], c_new5[2], c_new5[3], c_new5[4],
              interp_samples);
  for (unsigned i = 0; i < n; i++) {
    y[i] = f.Process(x[i]);
    c.Interpolate(1.0);
  }
}

// Fractional polyphase read (ref: FractionalSample)
double ref_fractional_sample(const float* buffer, unsigned channel,
                             unsigned channels, unsigned length, double pos) {
  return FractionalSample(buffer, channel, channels, length, pos);
}

unsigned ref_fractional_headroom() {
  return FractionalSampleAdditionalDelayRequired();
}

// All-pass block process (ref: AllPassFilter<float>::Process)
void ref_allpass_process(float coeff, unsigned delay, unsigned nch,
                         const float* src, float* dst, unsigned nframes) {
  AllPassFilter<float> f(nch, delay);
  f.SetCoeff(coeff);
  f.Process(src, dst, 0, nch, 0, nch, nframes);
}

}
