"""Net surgery (reference: examples/net_surgery.ipynb).

The classic Caffe tutorial, on the deepcut_tpu compat API:
1. edit a conv filter in place through `net.params` and see the output change;
2. cast a classifier into a fully-convolutional net by transplanting
   InnerProduct weights into 1x1 convolutions, so it slides over larger
   inputs and emits a score map instead of a single vector.

Run: PYTHONPATH=. python examples/net_surgery.py
"""

import numpy as np

import deepcut_tpu.compat as caffe
from deepcut_tpu.net_spec import NetSpec, layers as L
from deepcut_tpu.proto import text_format


def classifier_prototxt(h: int, w: int, fully_conv: bool) -> str:
    """A tiny classifier; `fully_conv` swaps the IP head for a 1x1 conv."""
    n = NetSpec()
    n.data = L.Input(shape=dict(dim=[1, 3, h, w]))
    n.conv = L.Convolution(n.data, num_output=8, kernel_size=5, stride=2,
                           weight_filler=dict(type="gaussian", std=0.1))
    n.relu = L.ReLU(n.conv, in_place=True)
    n.pool = L.Pooling(n.pool if False else n.conv, pool=0, kernel_size=3,
                       stride=3)
    if fully_conv:
        # the surgered head: 1x1 conv with the SAME weights as the IP
        n.score = L.Convolution(n.pool, num_output=4, kernel_size=1,
                                weight_filler=dict(type="constant"))
    else:
        n.ip = L.InnerProduct(n.pool, num_output=4,
                              weight_filler=dict(type="gaussian", std=0.1))
    return n.to_proto_text()


def main() -> None:
    rng = np.random.RandomState(0)

    # --- 1. filter surgery -------------------------------------------------
    import tempfile, os

    small = classifier_prototxt(33, 33, fully_conv=False)
    with tempfile.NamedTemporaryFile("w", suffix=".prototxt", delete=False) as f:
        f.write(small)
        small_path = f.name
    net = caffe.Net(small_path, caffe.TEST)
    x = rng.randn(1, 3, 33, 33).astype(np.float32)
    before = net.forward(blobs=["conv"], data=x)["conv"].copy()
    # zero one filter through the params view — writes push through to the
    # live net, exactly the pycaffe net-surgery idiom
    net.params["conv"][0].data[..., 0] = 0.0  # HWIO layout: output channel 0
    after = net.forward(blobs=["conv"], data=x)["conv"]
    assert np.allclose(after[:, 0], 0.0), "zeroed filter must output zeros"
    assert not np.allclose(after[:, 1], 0.0)
    print("filter surgery: channel 0 silenced, others untouched")

    # --- 2. fully-convolutional cast ---------------------------------------
    # sizes chosen so pooling divides exactly (33 -> conv 15 -> pool 5);
    # with ceil-mode partial windows the sliding equivalence only holds in
    # the interior, as the reference notebook also notes.
    pool_shape = net.blobs["pool"].shape  # (1, 8, ph, pw)
    _, c, ph, pw = pool_shape
    ip_w = net.params["ip"][0].data      # (4, 8*ph*pw) Caffe layout
    ip_b = net.params["ip"][1].data

    big = classifier_prototxt(63, 63, fully_conv=True)
    with tempfile.NamedTemporaryFile("w", suffix=".prototxt", delete=False) as f:
        f.write(big)
        big_path = f.name
    fcn = caffe.Net(big_path, caffe.TEST)
    # transplant: conv stays; IP (4, C*ph*pw) -> conv (ph, pw, C, 4)? The
    # sliding window wants kernel (ph, pw): reshape Caffe's row-major
    # (out, C, ph, pw) then to HWIO.
    fcn._net.params["conv"] = dict(net._net.params["conv"])
    k = ip_w.reshape(4, c, ph, pw).transpose(2, 3, 1, 0)  # HWIO
    # the surgered score layer must use kernel (ph, pw), not 1x1 — rebuild
    # the prototxt with the real kernel for exactness:
    big = big.replace("kernel_size: 1", f"kernel_h: {ph} kernel_w: {pw}")
    with open(big_path, "w") as f:
        f.write(big)
    fcn = caffe.Net(big_path, caffe.TEST)
    fcn._net.params["conv"] = dict(net._net.params["conv"])
    fcn._net.params["score"] = {"w": k, "b": ip_b}

    xb = rng.randn(1, 3, 63, 63).astype(np.float32)
    score_map = fcn.forward(blobs=["score"], data=xb)["score"]
    print(f"fully-convolutional score map: {score_map.shape} "
          f"(a classifier slid over the 2x input)")
    # parity check: the top-left window must equal the small classifier
    small_out = net.forward(data=xb[:, :, :33, :33])["ip"]
    np.testing.assert_allclose(score_map[:, :, 0, 0], small_out.reshape(1, 4),
                               rtol=1e-4, atol=1e-4)
    print("top-left window matches the dense classifier: surgery exact")
    os.unlink(small_path); os.unlink(big_path)


if __name__ == "__main__":
    main()
