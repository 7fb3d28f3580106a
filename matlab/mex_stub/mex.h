/* Minimal MATLAB MEX C API surface for building and testing caffe_.cpp
 * WITHOUT a MATLAB installation.
 *
 * Only the functions caffe_.cpp uses are declared, with the documented
 * MATLAB signatures, so the same caffe_.cpp translation unit compiles
 * unchanged against the real mex.h/matrix.h inside MATLAB (`mex` command)
 * and against this stub for the ctypes-driven test harness
 * (tests/test_matlab_mex.py).  The stub implementation lives in
 * mex_stub.cpp; reference API shape: /root/reference/matlab/+caffe/
 * private/caffe_.cpp (usage only — this header is written from the
 * public MEX API documentation, not from any MATLAB source).
 */
#ifndef DEEPCUT_TPU_MEX_STUB_H_
#define DEEPCUT_TPU_MEX_STUB_H_

#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef size_t mwSize;
typedef size_t mwIndex;

typedef enum {
  mxUNKNOWN_CLASS = 0,
  mxCELL_CLASS,
  mxSTRUCT_CLASS,
  mxCHAR_CLASS,
  mxDOUBLE_CLASS,
  mxSINGLE_CLASS,
  mxUINT64_CLASS
} mxClassID;

typedef enum { mxREAL = 0, mxCOMPLEX } mxComplexity;

typedef struct mxArray_tag mxArray;

/* creation */
mxArray* mxCreateString(const char* str);
mxArray* mxCreateDoubleScalar(double value);
mxArray* mxCreateDoubleMatrix(mwSize m, mwSize n, mxComplexity flag);
mxArray* mxCreateNumericMatrix(mwSize m, mwSize n, mxClassID classid,
                               mxComplexity flag);
mxArray* mxCreateNumericArray(mwSize ndim, const mwSize* dims,
                              mxClassID classid, mxComplexity flag);
mxArray* mxCreateStructMatrix(mwSize m, mwSize n, int nfields,
                              const char** fieldnames);
mxArray* mxCreateCellMatrix(mwSize m, mwSize n);

/* inspection */
mxClassID mxGetClassID(const mxArray* pa);
int mxIsChar(const mxArray* pa);
int mxIsDouble(const mxArray* pa);
int mxIsSingle(const mxArray* pa);
int mxIsUint64(const mxArray* pa);
int mxIsStruct(const mxArray* pa);
int mxIsCell(const mxArray* pa);
size_t mxGetNumberOfElements(const mxArray* pa);
mwSize mxGetNumberOfDimensions(const mxArray* pa);
const mwSize* mxGetDimensions(const mxArray* pa);

/* data access */
void* mxGetData(const mxArray* pa);
double* mxGetPr(const mxArray* pa);
double mxGetScalar(const mxArray* pa);
char* mxArrayToString(const mxArray* pa); /* caller mxFree()s */

/* struct access */
mxArray* mxGetField(const mxArray* pa, mwIndex index, const char* fieldname);
void mxSetField(mxArray* pa, mwIndex index, const char* fieldname,
                mxArray* value);
int mxGetNumberOfFields(const mxArray* pa);
const char* mxGetFieldNameByNumber(const mxArray* pa, int fieldnumber);
mxArray* mxGetFieldByNumber(const mxArray* pa, mwIndex index,
                            int fieldnumber);

/* cell access */
void mxSetCell(mxArray* pa, mwIndex index, mxArray* value);
mxArray* mxGetCell(const mxArray* pa, mwIndex index);

/* memory */
void mxFree(void* ptr);
void mxDestroyArray(mxArray* pa);

/* mex runtime */
void mexErrMsgTxt(const char* msg);
int mexPrintf(const char* fmt, ...);
void mexLock(void);

/* the gateway's entry point (C linkage, as in MATLAB's mex.h) */
void mexFunction(int nlhs, mxArray* plhs[], int nrhs,
                 const mxArray* prhs[]);

#ifdef __cplusplus
} /* extern "C" */
#endif

#endif /* DEEPCUT_TPU_MEX_STUB_H_ */
