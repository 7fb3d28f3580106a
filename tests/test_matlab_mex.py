"""MATLAB MEX marshalling layer, driven for real through ctypes.

Compiles matlab/+caffe/private/caffe_.cpp (the embedded-CPython MEX
gateway) against the in-repo mex API stub and calls mexFunction with
mxArrays built through the same mx* C calls MATLAB makes — so argument
marshalling, result marshalling, handle structs, the column-major byte
contract, and the error path are all exercised without a MATLAB
installation. Scenario parity: reference matlab/+caffe/+test/
{test_net,test_solver,test_io}.m.
"""

import ctypes
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SO = os.path.join(REPO, "matlab", "+caffe", "private", "caffe_test.so")

mxSTRUCT, mxCHAR, mxDOUBLE, mxSINGLE, mxUINT64 = 2, 3, 4, 5, 6


@pytest.fixture(scope="module")
def lib():
    srcs = [os.path.join(REPO, "matlab", "+caffe", "private", "caffe_.cpp"),
            os.path.join(REPO, "matlab", "mex_stub", "mex_stub.cpp")]
    if (not os.path.exists(SO)
            or os.path.getmtime(SO) < max(os.path.getmtime(s) for s in srcs)):
        subprocess.run([sys.executable, os.path.join(REPO, "matlab",
                                                     "build.py")], check=True)
    L = ctypes.CDLL(SO)
    for name, res, args in [
        ("mxCreateString", ctypes.c_void_p, [ctypes.c_char_p]),
        ("mxCreateDoubleScalar", ctypes.c_void_p, [ctypes.c_double]),
        ("mxCreateDoubleMatrix", ctypes.c_void_p,
         [ctypes.c_size_t, ctypes.c_size_t, ctypes.c_int]),
        ("mxCreateNumericArray", ctypes.c_void_p,
         [ctypes.c_size_t, ctypes.POINTER(ctypes.c_size_t),
          ctypes.c_int, ctypes.c_int]),
        ("mxGetData", ctypes.c_void_p, [ctypes.c_void_p]),
        ("mxGetPr", ctypes.POINTER(ctypes.c_double), [ctypes.c_void_p]),
        ("mxGetScalar", ctypes.c_double, [ctypes.c_void_p]),
        ("mxArrayToString", ctypes.c_char_p, [ctypes.c_void_p]),
        ("mxGetClassID", ctypes.c_int, [ctypes.c_void_p]),
        ("mxGetNumberOfElements", ctypes.c_size_t, [ctypes.c_void_p]),
        ("mxGetNumberOfDimensions", ctypes.c_size_t, [ctypes.c_void_p]),
        ("mxGetDimensions", ctypes.POINTER(ctypes.c_size_t),
         [ctypes.c_void_p]),
        ("mxGetField", ctypes.c_void_p,
         [ctypes.c_void_p, ctypes.c_size_t, ctypes.c_char_p]),
        ("mxGetNumberOfFields", ctypes.c_int, [ctypes.c_void_p]),
        ("mxGetFieldNameByNumber", ctypes.c_char_p,
         [ctypes.c_void_p, ctypes.c_int]),
        ("mxGetCell", ctypes.c_void_p, [ctypes.c_void_p, ctypes.c_size_t]),
        ("mex_test_call", ctypes.c_int,
         [ctypes.c_int, ctypes.POINTER(ctypes.c_void_p), ctypes.c_int,
          ctypes.POINTER(ctypes.c_void_p), ctypes.c_char_p, ctypes.c_int]),
        ("mex_test_drain_printed", ctypes.c_int,
         [ctypes.c_char_p, ctypes.c_int]),
    ]:
        fn = getattr(L, name)
        fn.restype, fn.argtypes = res, args
    return L


class Mex:
    """Tiny MATLAB-caller stand-in over the stub's C API."""

    def __init__(self, lib):
        self.L = lib

    # -- build mxArrays the way MATLAB would ------------------------------
    def str_(self, s):
        return self.L.mxCreateString(s.encode())

    def dbl(self, v):
        return self.L.mxCreateDoubleScalar(float(v))

    def dvec(self, vals):
        pa = self.L.mxCreateDoubleMatrix(1, len(vals), 0)
        p = self.L.mxGetPr(pa)
        for i, v in enumerate(vals):
            p[i] = float(v)
        return pa

    def single(self, arr):
        """Caffe-order numpy array -> MATLAB single (reversed dims, same
        bytes — the caffe_.cpp:13-17 layout contract)."""
        a = np.ascontiguousarray(arr, np.float32)
        ml = list(reversed(a.shape)) or [1, 1]
        dims = (ctypes.c_size_t * len(ml))(*ml)
        pa = self.L.mxCreateNumericArray(len(ml), dims, mxSINGLE, 0)
        ctypes.memmove(self.L.mxGetData(pa), a.tobytes(), a.nbytes)
        return pa

    # -- read mxArrays back ------------------------------------------------
    def to_np(self, pa):
        nd = self.L.mxGetNumberOfDimensions(pa)
        dims = self.L.mxGetDimensions(pa)
        ml = [dims[i] for i in range(nd)]
        n = int(np.prod(ml))
        buf = ctypes.string_at(self.L.mxGetData(pa), n * 4)
        return np.frombuffer(buf, "<f4").reshape(tuple(reversed(ml)))

    def to_list(self, pa):
        n = self.L.mxGetNumberOfElements(pa)
        p = self.L.mxGetPr(pa)
        return [p[i] for i in range(n)]

    def cellstr(self, pa):
        n = self.L.mxGetNumberOfElements(pa)
        return [self.L.mxArrayToString(self.L.mxGetCell(pa, i)).decode()
                for i in range(n)]

    def field(self, pa, name, index=0):
        return self.L.mxGetField(pa, index, name.encode())

    def fieldnames(self, pa):
        return [self.L.mxGetFieldNameByNumber(pa, i).decode()
                for i in range(self.L.mxGetNumberOfFields(pa))]

    # -- the caffe_(...) call ----------------------------------------------
    def call(self, cmd, *args, nlhs=1):
        prhs = (ctypes.c_void_p * (1 + len(args)))(self.str_(cmd), *args)
        plhs = (ctypes.c_void_p * max(nlhs, 1))()
        err = ctypes.create_string_buffer(2048)
        rc = self.L.mex_test_call(nlhs, plhs, 1 + len(args), prhs, err, 2048)
        if rc:
            raise RuntimeError(err.value.decode())
        return [plhs[i] for i in range(nlhs)]

    def printed(self):
        buf = ctypes.create_string_buffer(4096)
        self.L.mex_test_drain_printed(buf, 4096)
        return buf.value.decode()


@pytest.fixture(scope="module")
def mex(lib):
    return Mex(lib)


@pytest.fixture(scope="module")
def net_file(tmp_path_factory):
    from test_matlab_binding import NET_FIXTURE
    p = tmp_path_factory.mktemp("mex") / "testnet.prototxt"
    p.write_text(NET_FIXTURE.format(num_output=13))
    return str(p)


def _blob_handle(mex, attr, name):
    """Handle struct for blob `name` copied into a fresh 1x1 struct the way
    matcaffe's Net.m indexes self.attributes.hBlob_blobs(index)."""
    idx = mex.cellstr(mex.field(attr, "blob_names")).index(name)
    return _index_handle(mex, mex.field(attr, "hBlob_blobs"), idx)


def _layer_handle(mex, attr, name):
    idx = mex.cellstr(mex.field(attr, "layer_names")).index(name)
    return _index_handle(mex, mex.field(attr, "hLayer_layers"), idx)


def _index_handle(mex, hvec, idx):
    # rebuild a scalar struct: MATLAB slicing hands the callee a copy
    ptr = mex.L.mxGetScalar(mex.field(hvec, "ptr", idx))
    key = mex.L.mxGetScalar(mex.field(hvec, "init_key", idx))
    return _handle_struct(mex, ptr, key)


def _handle_struct(mex, ptr, key):
    names = (ctypes.c_char_p * 2)(b"ptr", b"init_key")
    mk = mex.L
    mk.mxCreateStructMatrix.restype = ctypes.c_void_p
    mk.mxCreateStructMatrix.argtypes = [ctypes.c_size_t, ctypes.c_size_t,
                                        ctypes.c_int,
                                        ctypes.POINTER(ctypes.c_char_p)]
    st = mk.mxCreateStructMatrix(1, 1, 2, names)
    mk.mxSetField.restype = None
    mk.mxSetField.argtypes = [ctypes.c_void_p, ctypes.c_size_t,
                              ctypes.c_char_p, ctypes.c_void_p]
    dims = (ctypes.c_size_t * 2)(1, 1)
    pv = mk.mxCreateNumericArray(2, dims, mxUINT64, 0)
    ctypes.cast(mk.mxGetData(pv),
                ctypes.POINTER(ctypes.c_uint64))[0] = int(ptr)
    mk.mxSetField(st, 0, b"ptr", pv)
    mk.mxSetField(st, 0, b"init_key", mk.mxCreateDoubleScalar(float(key)))
    return st


def test_version_and_init_key(mex):
    (v,) = mex.call("version")
    assert mex.L.mxGetClassID(v) == mxCHAR
    assert "caffe 1.0.0-rc3" in mex.L.mxArrayToString(v).decode()
    (k,) = mex.call("get_init_key")
    assert mex.L.mxGetClassID(k) == mxDOUBLE


def test_net_roundtrip_matches_gateway(mex, net_file):
    """get_net / net_get_attr / forward / blob data through the C layer,
    byte-compared against the same ops through the pure-Python gateway."""
    (h,) = mex.call("get_net", mex.str_(net_file), mex.str_("train"))
    assert mex.L.mxGetClassID(h) == mxSTRUCT
    (attr,) = mex.call("net_get_attr", h)
    assert mex.fieldnames(attr) == [
        "hLayer_layers", "hBlob_blobs", "input_blob_indices",
        "output_blob_indices", "layer_names", "blob_names"]
    assert mex.cellstr(mex.field(attr, "layer_names")) == [
        "data", "conv", "ip", "loss"]

    data_h = _blob_handle(mex, attr, "data")
    (sh,) = mex.call("blob_get_shape", data_h)
    assert mex.to_list(sh) == [4.0, 3.0, 2.0, 5.0]  # MATLAB W H C N

    tens = np.arange(5 * 2 * 3 * 4, dtype=np.float32).reshape(5, 2, 3, 4)
    mex.call("blob_set_data", data_h, mex.single(tens), nlhs=0)
    (back,) = mex.call("blob_get_data", data_h)
    np.testing.assert_array_equal(mex.to_np(back), tens)

    label_h = _blob_handle(mex, attr, "label")
    labels = np.random.RandomState(0).randint(0, 13, (5, 1, 1, 1))
    mex.call("blob_set_data", label_h, mex.single(labels), nlhs=0)
    mex.call("net_forward", h, nlhs=0)
    (loss,) = mex.call("blob_get_data", _blob_handle(mex, attr, "loss"))
    assert np.isfinite(mex.to_np(loss)).all()

    mex.call("net_backward", h, nlhs=0)
    (dd,) = mex.call("blob_get_diff", _blob_handle(mex, attr, "data"))
    assert np.abs(mex.to_np(dd)).sum() > 0

    # layer params come back in Caffe blob order, reversed for MATLAB
    conv_h = _layer_handle(mex, attr, "conv")
    (lattr,) = mex.call("layer_get_attr", conv_h)
    w_h = _index_handle(mex, mex.field(lattr, "hBlob_blobs"), 0)
    (wsh,) = mex.call("blob_get_shape", w_h)
    assert mex.to_list(wsh) == [2.0, 2.0, 2.0, 11.0]
    (typ,) = mex.call("layer_get_type", conv_h)
    assert mex.L.mxArrayToString(typ).decode() == "Convolution"


def test_blob_reshape_through_dvec(mex, net_file):
    (h,) = mex.call("get_net", mex.str_(net_file), mex.str_("train"))
    (attr,) = mex.call("net_get_attr", h)
    data_h = _blob_handle(mex, attr, "data")
    mex.call("blob_reshape", data_h, mex.dvec([6, 5, 4, 3, 2, 1]), nlhs=0)
    (sh,) = mex.call("blob_get_shape", data_h)
    assert mex.to_list(sh) == [6.0, 5.0, 4.0, 3.0, 2.0, 1.0]


def test_solver_step_and_attr(mex, net_file, tmp_path):
    sfile = tmp_path / "solver.prototxt"
    sfile.write_text(f'net: "{net_file}"\nbase_lr: 0.01\nmomentum: 0.9\n'
                     'lr_policy: "fixed"\ndisplay: 0\nmax_iter: 100\n'
                     'snapshot_after_train: false\n')
    (hs,) = mex.call("get_solver", mex.str_(str(sfile)))
    (attr,) = mex.call("solver_get_attr", hs)
    hnet = _index_handle(mex, mex.field(attr, "hNet_net"), 0)
    (nattr,) = mex.call("net_get_attr", hnet)
    label_h = _blob_handle(mex, nattr, "label")
    labels = np.random.RandomState(2).randint(0, 13, (5, 1, 1, 1))
    mex.call("blob_set_data", label_h, mex.single(labels), nlhs=0)
    mex.call("solver_step", hs, mex.dbl(3), nlhs=0)
    (it,) = mex.call("solver_get_iter", hs)
    assert mex.L.mxGetScalar(it) == 3.0


def test_read_write_mean(mex, tmp_path):
    mean = (255 * np.random.RandomState(3).rand(3, 6, 4)).astype(np.float32)
    mfile = str(tmp_path / "mean.binaryproto")
    mex.call("write_mean", mex.single(mean), mex.str_(mfile), nlhs=0)
    (got,) = mex.call("read_mean", mex.str_(mfile))
    np.testing.assert_allclose(mex.to_np(got).reshape(mean.shape), mean)


def test_error_paths_and_reset(mex, net_file):
    with pytest.raises(RuntimeError, match="Unknown command"):
        mex.call("no_such_cmd")
    with pytest.raises(RuntimeError, match="Unknown command"):
        mex.call("")  # empty command string reaches dispatch verbatim
    # zero-argument call never reaches Python: Usage error from the C layer
    plhs = (ctypes.c_void_p * 1)()
    err = ctypes.create_string_buffer(256)
    assert mex.L.mex_test_call(1, plhs, 0, None, err, 256) == 1
    assert b"Usage" in err.value
    with pytest.raises(RuntimeError, match="Unknown phase"):
        mex.call("get_net", mex.str_(net_file), mex.str_("deploy"))

    (h,) = mex.call("get_net", mex.str_(net_file), mex.str_("train"))
    mex.call("reset", nlhs=0)
    assert "stand-alone nets" in mex.printed()  # mexPrintf side channel
    with pytest.raises(RuntimeError, match="init_key"):
        mex.call("net_forward", h, nlhs=0)
    # stale handle with a forged init_key is also rejected
    bad = _handle_struct(mex, 1, -1.0)
    with pytest.raises(RuntimeError, match="init_key"):
        mex.call("net_forward", bad, nlhs=0)
