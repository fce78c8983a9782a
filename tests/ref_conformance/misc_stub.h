// Minimal bbcat-base stub for compiling the reference conversion matrix
// out-of-tree (conformance testing only; see tests/test_reference_conformance.py)
#ifndef __BBCAT_BASE_MISC_STUB__
#define __BBCAT_BASE_MISC_STUB__
#include <stdint.h>
#include <stdio.h>
#include <algorithm>
typedef unsigned int uint_t;
typedef int sint_t;
typedef int16_t sint16_t;
typedef int32_t sint32_t;
typedef int64_t sint64_t;
typedef uint16_t uint16_t_;
typedef uint8_t uint8_t_;
typedef float Sample_t;
#define BBC_AUDIOTOOLBOX_START namespace bbcat {
#define BBC_AUDIOTOOLBOX_END }
#define USE_BBC_AUDIOTOOLBOX using namespace bbcat;
#define BBCERROR(...) do { } while (0)
#define BBCDEBUG(...) do { } while (0)
#define BBCDEBUG2(...) do { } while (0)
#define BBCDEBUG3(...) do { } while (0)
#define BBCDEBUG4(...) do { } while (0)
#define UNUSED_PARAMETER(x) ((void)(x))
#if defined(__BYTE_ORDER__) && (__BYTE_ORDER__ == __ORDER_BIG_ENDIAN__)
#define MACHINE_IS_BIG_ENDIAN true
#else
#define MACHINE_IS_BIG_ENDIAN false
#endif
#define MEMALIGNED(align, decl) decl __attribute__((aligned(align)))
namespace limited {
  template<typename T> T limit(T v, T lo, T hi) { return std::max(lo, std::min(hi, v)); }
  template<typename T> T subz(T a, T b) { return (a > b) ? (a - b) : 0; }
}
#endif
