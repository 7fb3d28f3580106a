/* In-process implementation of the mex.h stub, plus a small C test
 * harness so tests/test_matlab_mex.py can drive mexFunction through
 * ctypes: build mxArrays with the same mx* calls MATLAB would make,
 * invoke mex_test_call(), and read results back.
 *
 * Error semantics mirror MATLAB: mexErrMsgTxt aborts the current command
 * (here: throws, caught at the mex_test_call boundary) and mexPrintf
 * output is buffered for the harness to drain.
 */
#include "mex.h"

#include <cstdarg>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <stdexcept>
#include <string>
#include <vector>

struct mxArray_tag {
  mxClassID classid = mxUNKNOWN_CLASS;
  std::vector<mwSize> dims;               // MATLAB dims, >= 2 entries
  std::vector<unsigned char> data;        // numeric payload
  std::string str;                        // mxCHAR_CLASS payload
  std::vector<std::string> fieldnames;    // mxSTRUCT_CLASS
  std::vector<std::vector<mxArray*> > fields;  // [element][field]
  std::vector<mxArray*> cells;            // mxCELL_CLASS
};

namespace {

struct MexAbort : std::runtime_error {
  explicit MexAbort(const std::string& m) : std::runtime_error(m) {}
};

std::string g_printed;

size_t elem_size(mxClassID c) {
  switch (c) {
    case mxDOUBLE_CLASS: return 8;
    case mxUINT64_CLASS: return 8;
    case mxSINGLE_CLASS: return 4;
    default: return 1;
  }
}

size_t count_of(const std::vector<mwSize>& dims) {
  size_t n = 1;
  for (size_t i = 0; i < dims.size(); ++i) n *= dims[i];
  return n;
}

mxArray* new_numeric(const std::vector<mwSize>& dims, mxClassID classid) {
  mxArray* pa = new mxArray_tag();
  pa->classid = classid;
  pa->dims = dims;
  while (pa->dims.size() < 2) pa->dims.push_back(1);
  pa->data.assign(count_of(pa->dims) * elem_size(classid), 0);
  return pa;
}

}  // namespace

extern "C" {

mxArray* mxCreateString(const char* str) {
  mxArray* pa = new mxArray_tag();
  pa->classid = mxCHAR_CLASS;
  pa->str = str ? str : "";
  pa->dims.push_back(1);
  pa->dims.push_back(pa->str.size());
  return pa;
}

mxArray* mxCreateDoubleScalar(double value) {
  std::vector<mwSize> d(2, 1);
  mxArray* pa = new_numeric(d, mxDOUBLE_CLASS);
  std::memcpy(pa->data.data(), &value, sizeof(double));
  return pa;
}

mxArray* mxCreateDoubleMatrix(mwSize m, mwSize n, mxComplexity) {
  std::vector<mwSize> d;
  d.push_back(m);
  d.push_back(n);
  return new_numeric(d, mxDOUBLE_CLASS);
}

mxArray* mxCreateNumericMatrix(mwSize m, mwSize n, mxClassID classid,
                               mxComplexity) {
  std::vector<mwSize> d;
  d.push_back(m);
  d.push_back(n);
  return new_numeric(d, classid);
}

mxArray* mxCreateNumericArray(mwSize ndim, const mwSize* dims,
                              mxClassID classid, mxComplexity) {
  std::vector<mwSize> d(dims, dims + ndim);
  return new_numeric(d, classid);
}

mxArray* mxCreateStructMatrix(mwSize m, mwSize n, int nfields,
                              const char** fieldnames) {
  mxArray* pa = new mxArray_tag();
  pa->classid = mxSTRUCT_CLASS;
  pa->dims.push_back(m);
  pa->dims.push_back(n);
  for (int f = 0; f < nfields; ++f) pa->fieldnames.push_back(fieldnames[f]);
  pa->fields.assign(m * n, std::vector<mxArray*>(nfields, NULL));
  return pa;
}

mxArray* mxCreateCellMatrix(mwSize m, mwSize n) {
  mxArray* pa = new mxArray_tag();
  pa->classid = mxCELL_CLASS;
  pa->dims.push_back(m);
  pa->dims.push_back(n);
  pa->cells.assign(m * n, NULL);
  return pa;
}

mxClassID mxGetClassID(const mxArray* pa) { return pa->classid; }
int mxIsChar(const mxArray* pa) { return pa->classid == mxCHAR_CLASS; }
int mxIsDouble(const mxArray* pa) { return pa->classid == mxDOUBLE_CLASS; }
int mxIsSingle(const mxArray* pa) { return pa->classid == mxSINGLE_CLASS; }
int mxIsUint64(const mxArray* pa) { return pa->classid == mxUINT64_CLASS; }
int mxIsStruct(const mxArray* pa) { return pa->classid == mxSTRUCT_CLASS; }
int mxIsCell(const mxArray* pa) { return pa->classid == mxCELL_CLASS; }

size_t mxGetNumberOfElements(const mxArray* pa) {
  if (pa->classid == mxCHAR_CLASS) return pa->str.size();
  return count_of(pa->dims);
}

mwSize mxGetNumberOfDimensions(const mxArray* pa) { return pa->dims.size(); }

const mwSize* mxGetDimensions(const mxArray* pa) { return pa->dims.data(); }

void* mxGetData(const mxArray* pa) {
  return const_cast<unsigned char*>(pa->data.data());
}

double* mxGetPr(const mxArray* pa) {
  return reinterpret_cast<double*>(mxGetData(pa));
}

double mxGetScalar(const mxArray* pa) {
  if (pa->classid == mxDOUBLE_CLASS) return *mxGetPr(pa);
  if (pa->classid == mxSINGLE_CLASS)
    return *reinterpret_cast<const float*>(pa->data.data());
  if (pa->classid == mxUINT64_CLASS)
    return static_cast<double>(
        *reinterpret_cast<const unsigned long long*>(pa->data.data()));
  mexErrMsgTxt("mxGetScalar: unsupported class");
  return 0.0;
}

char* mxArrayToString(const mxArray* pa) {
  char* out = static_cast<char*>(std::malloc(pa->str.size() + 1));
  std::memcpy(out, pa->str.c_str(), pa->str.size() + 1);
  return out;
}

mxArray* mxGetField(const mxArray* pa, mwIndex index, const char* fieldname) {
  for (size_t f = 0; f < pa->fieldnames.size(); ++f)
    if (pa->fieldnames[f] == fieldname) return pa->fields[index][f];
  return NULL;
}

void mxSetField(mxArray* pa, mwIndex index, const char* fieldname,
                mxArray* value) {
  for (size_t f = 0; f < pa->fieldnames.size(); ++f)
    if (pa->fieldnames[f] == fieldname) {
      pa->fields[index][f] = value;
      return;
    }
}

int mxGetNumberOfFields(const mxArray* pa) {
  return static_cast<int>(pa->fieldnames.size());
}

const char* mxGetFieldNameByNumber(const mxArray* pa, int fieldnumber) {
  return pa->fieldnames[fieldnumber].c_str();
}

mxArray* mxGetFieldByNumber(const mxArray* pa, mwIndex index,
                            int fieldnumber) {
  return pa->fields[index][fieldnumber];
}

void mxSetCell(mxArray* pa, mwIndex index, mxArray* value) {
  pa->cells[index] = value;
}

mxArray* mxGetCell(const mxArray* pa, mwIndex index) {
  return pa->cells[index];
}

void mxFree(void* ptr) { std::free(ptr); }

void mxDestroyArray(mxArray* pa) {
  /* Test harness keeps lifetimes simple: children may be shared, so the
   * stub frees only the node itself and lets the test process exit clean
   * up the rest (MATLAB's GC has no analog worth faking here). */
  delete pa;
}

void mexErrMsgTxt(const char* msg) { throw MexAbort(msg ? msg : "error"); }

int mexPrintf(const char* fmt, ...) {
  char buf[4096];
  va_list ap;
  va_start(ap, fmt);
  int n = vsnprintf(buf, sizeof(buf), fmt, ap);
  va_end(ap);
  g_printed += buf;
  return n;
}

void mexLock(void) {}

/* ------------------------------------------------------------------ */
/* ctypes test harness                                                  */

void mexFunction(int nlhs, mxArray** plhs, int nrhs, const mxArray** prhs);

int mex_test_call(int nlhs, mxArray** plhs, int nrhs, const mxArray** prhs,
                  char* errbuf, int errlen) {
  try {
    mexFunction(nlhs, plhs, nrhs, prhs);
    return 0;
  } catch (const std::exception& e) {
    if (errbuf && errlen > 0) {
      std::strncpy(errbuf, e.what(), errlen - 1);
      errbuf[errlen - 1] = '\0';
    }
    return 1;
  }
}

int mex_test_drain_printed(char* buf, int len) {
  int n = static_cast<int>(g_printed.size());
  if (buf && len > 0) {
    std::strncpy(buf, g_printed.c_str(), len - 1);
    buf[len - 1] = '\0';
  }
  g_printed.clear();
  return n;
}

}  /* extern "C" */
