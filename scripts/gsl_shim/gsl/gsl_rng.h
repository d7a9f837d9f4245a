#include "gsl_shim_impl.h"
