"""Op library: Caffe layer semantics expressed as pure JAX functions.

Each op is a pure function ``f(params, *inputs, **static_config) -> outputs``
operating on NHWC tensors (TPU-friendly: channels on the 128-lane dimension),
whereas the reference operates on NCHW Blobs. The graph engine
(`deepcut_tpu.core.graph`) adapts Caffe layer configs onto these functions.
"""

from deepcut_tpu.ops.conv import conv2d, deconv2d, conv_output_size, deconv_output_size
from deepcut_tpu.ops.pool import max_pool2d, avg_pool2d, pool_output_size
from deepcut_tpu.ops.norm import batch_norm_inference, batch_norm_train, scale, lrn, mvn
from deepcut_tpu.ops.activations import (
    relu, sigmoid, tanh, elu, prelu, bnll, exp_op, log_op, power_op, threshold,
    absval, dropout,
)
from deepcut_tpu.ops.eltwise import eltwise_sum, eltwise_prod, eltwise_max, crop_like
from deepcut_tpu.ops.linear import inner_product, embed
