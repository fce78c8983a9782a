// C ABI shim over the reference TransferSamples for ctypes conformance tests
#include "SoundFormatConversions.h"
USE_BBC_AUDIOTOOLBOX
extern "C" int ref_transfer(const uint8_t* src, int sfmt, int sbe,
                            unsigned sch, unsigned schs,
                            uint8_t* dst, int dfmt, int dbe,
                            unsigned dch, unsigned dchs,
                            unsigned nch, unsigned nfr) {
  TransferSamples((const void*)src, (SampleFormat_t)sfmt, sbe != 0, sch, schs,
                  (void*)dst, (SampleFormat_t)dfmt, dbe != 0, dch, dchs,
                  nch, nfr, NULL);
  return 0;
}
