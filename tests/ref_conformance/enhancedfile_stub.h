// Minimal EnhancedFile stub (only touched at BBCDEBUG_LEVEL >= 3)
#ifndef __BBCAT_BASE_ENHANCEDFILE_STUB__
#define __BBCAT_BASE_ENHANCEDFILE_STUB__
#include "misc.h"
BBC_AUDIOTOOLBOX_START
class EnhancedFile {
public:
  EnhancedFile(const char*, const char*) {}
  void fprintf(const char*, ...) {}
};
BBC_AUDIOTOOLBOX_END
#endif
