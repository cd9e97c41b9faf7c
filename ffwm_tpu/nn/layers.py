"""Torch-semantics layer library on flax.linen — NHWC, TPU-native.

Every layer here matches the corresponding ``torch.nn`` module bit-for-bit in
fp32 (given converted weights), which is what makes the reference's released
checkpoints loadable (<1e-3 parity gate, BASELINE.md). Key conventions:

  * images are NHWC; conv kernels are stored HWIO (MXU-friendly); transposed
    convs store the *forward-equivalent* kernel (spatially flipped, in/out
    transposed) so inference is a single `conv_general_dilated`,
  * BatchNorm matches torch exactly: biased batch variance for
    normalization, **unbiased** variance into the running estimate
    (flax.linen.BatchNorm differs — it stores biased variance),
  * SpectralNorm matches torch.nn.utils.spectral_norm: one power iteration
    on the (O, I*kh*kw) matrix per *training* forward (u, v stored as
    variables in the "spectral" collection), stored u/v reused at eval;
    sigma is differentiable w.r.t. the raw kernel.

Under ``jit`` with a GSPMD-sharded batch, BatchNorm statistics are computed
over the *global* batch automatically (the cross-replica reduction is
inserted by XLA) — the TPU-native equivalent of the large-batch semantics the
reference gets from being single-device (SURVEY.md §2.7). Under
``shard_map``/``pmap``, pass ``axis_name`` to reduce explicitly.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _pair(v: Union[int, Tuple[int, int]]) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


# --------------------------------------------------------------------------
# Initializers (torch-compatible)
# --------------------------------------------------------------------------

def kaiming_uniform_torch(key, shape, dtype=jnp.float32):
    """torch's default Conv/Linear weight init: kaiming_uniform(a=sqrt(5)).

    For HWIO conv kernels fan_in = kh*kw*I; gain = sqrt(2/(1+a^2)) = sqrt(1/3).
    """
    if len(shape) == 4:
        fan_in = shape[0] * shape[1] * shape[2]
    else:
        fan_in = shape[0]
    bound = math.sqrt(3.0) * math.sqrt(1.0 / 3.0) / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def kaiming_normal_msra(key, shape, dtype=jnp.float32):
    """torch kaiming_normal_ (fan_in, relu-family gain sqrt(2)) — the MSRA
    init used by FlowNet (reference: models/base_networks.py:8-24)."""
    if len(shape) == 4:
        fan_in = shape[0] * shape[1] * shape[2]
    else:
        fan_in = shape[0]
    std = math.sqrt(2.0 / fan_in)
    return jax.random.normal(key, shape, dtype) * std


def transposed_fan(init_fn):
    """Adapt a fan_in-based initializer to ConvTranspose kernels.

    torch's _calculate_fan_in for a ConvTranspose2d weight (I, O, kh, kw)
    is O*kh*kw (dim 1 is always "in" to torch, but dim 1 of a transposed
    conv's weight is the OUTPUT channel). Our stored kernel is the
    forward-equivalent HWIO (kh, kw, I, O), so the torch-parity fan comes
    from shape[3], not shape[2]: swap I/O before delegating. Applies to
    both torch's default kaiming_uniform(a=sqrt(5)) and the reference's
    initialize_msra kaiming_normal_ (models/base_networks.py:15-18)."""

    def init(key, shape, dtype=jnp.float32):
        kh, kw, i, o = shape
        sample = init_fn(key, (kh, kw, o, i), dtype)
        return jnp.swapaxes(sample, 2, 3)

    return init


def bias_uniform_torch(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


# --------------------------------------------------------------------------
# Activations
# --------------------------------------------------------------------------

def leaky_relu(x, negative_slope=0.2):
    return jnp.where(x >= 0, x, x * negative_slope)


def relu(x):
    return jnp.maximum(x, 0)


def sigmoid(x):
    return jax.nn.sigmoid(x)


def tanh(x):
    return jnp.tanh(x)


def tanh2(x):
    """(tanh(x) + 1) / 2 — reference Tanh2 (models/base_networks.py:179-184)."""
    return (jnp.tanh(x) + 1.0) * 0.5


ACTIVATIONS: dict[str, Callable] = {
    "relu": relu,
    "lrelu": lambda x: leaky_relu(x, 0.2),
    "sigmoid": sigmoid,
    "tanh": tanh,
    "tanh2": tanh2,
    "none": lambda x: x,
}


def get_activ(name: Optional[str]) -> Callable:
    if name is None:
        return lambda x: x
    return ACTIVATIONS[name]


# --------------------------------------------------------------------------
# Conv / ConvTranspose / Linear
# --------------------------------------------------------------------------

class Conv2d(nn.Module):
    """torch.nn.Conv2d on NHWC (kernel HWIO)."""

    features: int
    kernel_size: Union[int, Tuple[int, int]]
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    use_bias: bool = True
    kernel_init: Callable = kaiming_uniform_torch
    bias_init: Optional[Callable] = None  # default: torch uniform(1/sqrt(fan_in))
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.stride)
        ph, pw = _pair(self.padding)
        in_ch = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (kh, kw, in_ch, self.features))
        dt = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dt),
            kernel.astype(dt),
            window_strides=(sh, sw),
            padding=((ph, ph), (pw, pw)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            binit = self.bias_init or bias_uniform_torch(kh * kw * in_ch)
            bias = self.param("bias", binit, (self.features,))
            y = y + bias.astype(dt)
        return y


class ConvTranspose2d(nn.Module):
    """torch.nn.ConvTranspose2d on NHWC.

    Implemented as an input-dilated conv: stored kernel is the
    forward-equivalent HWIO layout (torch (I,O,kh,kw) spatially flipped and
    transposed at conversion time), padding = k - 1 - p, lhs_dilation = s.
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]]
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    output_padding: int = 0
    use_bias: bool = True
    kernel_init: Optional[Callable] = None  # default: torch-parity
                                            # transposed_fan(kaiming_uniform)
    bias_init: Optional[Callable] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.stride)
        ph, pw = _pair(self.padding)
        op = self.output_padding
        in_ch = x.shape[-1]
        # torch computes ConvTranspose fan_in from the OUT channel (weight
        # (I,O,kh,kw) -> O*kh*kw); wrap fan_in-based inits accordingly
        kinit = transposed_fan(self.kernel_init or kaiming_uniform_torch)
        kernel = self.param("kernel", kinit, (kh, kw, in_ch, self.features))
        dt = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dt),
            kernel.astype(dt),
            window_strides=(1, 1),
            padding=((kh - 1 - ph, kh - 1 - ph + op), (kw - 1 - pw, kw - 1 - pw + op)),
            lhs_dilation=(sh, sw),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            # torch ConvTranspose bias bound uses fan_in = out_ch? No:
            # weight (I,O,kh,kw) -> fan_in = O*kh*kw per torch _calculate_fan.
            binit = self.bias_init or bias_uniform_torch(kh * kw * self.features)
            bias = self.param("bias", binit, (self.features,))
            y = y + bias.astype(dt)
        return y


class Linear(nn.Module):
    """torch.nn.Linear (kernel stored (in, out))."""

    features: int
    use_bias: bool = True
    kernel_init: Callable = kaiming_uniform_torch
    bias_init: Optional[Callable] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (in_f, self.features))
        dt = self.dtype or x.dtype
        y = jnp.dot(x.astype(dt), kernel.astype(dt), preferred_element_type=dt)
        if self.use_bias:
            binit = self.bias_init or bias_uniform_torch(in_f)
            bias = self.param("bias", binit, (self.features,))
            y = y + bias.astype(dt)
        return y


# --------------------------------------------------------------------------
# Normalization
# --------------------------------------------------------------------------

class BatchNorm2d(nn.Module):
    """torch.nn.BatchNorm2d semantics on NHWC.

    * train: normalize by biased batch stats over (N, H, W); update running
      mean with batch mean and running var with the **unbiased** batch var
      (momentum 0.1, torch convention: new = (1-m)*old + m*batch).
    * eval: normalize by running stats.
    * ``axis_name``: reduce batch moments across a mapped axis (shard_map /
      pmap cross-replica BN). Under plain jit+GSPMD this is unnecessary —
      stats are global automatically.
    """

    momentum: float = 0.1
    epsilon: float = 1e-5
    use_running_average: Optional[bool] = None
    axis_name: Optional[str] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        eval_mode = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        ch = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (ch,))
        bias = self.param("bias", nn.initializers.zeros, (ch,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((ch,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((ch,), jnp.float32))

        dt = self.dtype or x.dtype
        if eval_mode:
            mean = ra_mean.value
            var = ra_var.value
        else:
            xf = x.astype(jnp.float32)
            if self.axis_name is not None:
                # one collective round: all-reduce the two raw moments
                mean = jax.lax.pmean(jnp.mean(xf, axis=(0, 1, 2)), self.axis_name)
                mean2 = jax.lax.pmean(jnp.mean(jnp.square(xf), axis=(0, 1, 2)),
                                      self.axis_name)
                var = mean2 - jnp.square(mean)
            else:
                # two-pass variance, matching torch: E[x^2]-E[x]^2 loses ~3e-5
                # rel accuracy to cancellation when |mean| >> std, which
                # compounds to ~0.5% gradient divergence across the 20-layer
                # FlowNet backward (measured by the train-step parity test)
                mean = jnp.mean(xf, axis=(0, 1, 2))
                var = jnp.mean(jnp.square(xf - mean), axis=(0, 1, 2))
            n = x.shape[0] * x.shape[1] * x.shape[2]
            if self.axis_name is not None:
                n = n * jax.lax.psum(1, self.axis_name)
            if not self.is_initializing():
                m = self.momentum
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x.astype(jnp.float32) - mean) * inv + bias
        return y.astype(dt)


class InstanceNorm2d(nn.Module):
    """torch.nn.InstanceNorm2d (no affine, no running stats — torch default).

    Capability parity for the reference's norm registry
    (models/base_networks.py:200-206); FFWM's live configs use 'bn'.
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average=None):
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon)


# --------------------------------------------------------------------------
# Spectral norm
# --------------------------------------------------------------------------

class SpectralNorm(nn.Module):
    """torch.nn.utils.spectral_norm for a conv/linear kernel.

    Wraps a raw kernel (HWIO for conv) and yields kernel / sigma where sigma
    is the leading singular value estimated by one power iteration over the
    torch-layout matrix W = kernel.(O, I*kh*kw). u/v live in the "spectral"
    variable collection; they are updated only when ``update_stats`` is True
    (training), matching torch's do_power_iteration gating. Gradients flow
    through sigma (u, v treated as constants), as in torch.
    """

    eps: float = 1e-12

    @nn.compact
    def __call__(self, kernel: jax.Array, update_stats: bool) -> jax.Array:
        if kernel.ndim == 4:
            # HWIO -> (O, I*kh*kw) in torch's OIHW flatten order
            w_mat = jnp.transpose(kernel, (3, 2, 0, 1)).reshape(kernel.shape[3], -1)
        else:
            # linear (in, out) -> (out, in)
            w_mat = kernel.T
        out_dim, in_dim = w_mat.shape

        # Deterministic u/v init (normalized gaussians, like torch); converted
        # checkpoints overwrite these, and power iteration re-converges in a
        # few steps when training from scratch.
        u_var = self.variable(
            "spectral", "u",
            lambda: _l2norm(jax.random.normal(jax.random.PRNGKey(0), (out_dim,)), self.eps),
        )
        v_var = self.variable(
            "spectral", "v",
            lambda: _l2norm(jax.random.normal(jax.random.PRNGKey(1), (in_dim,)), self.eps),
        )

        u, v = u_var.value, v_var.value
        if self.is_initializing():
            # Converge u/v at init so sigma estimates the true spectral norm
            # from the first step (a raw random u/v gives a near-zero sigma
            # that explodes deep eval-mode stacks; converted checkpoints
            # overwrite u/v anyway).
            for _ in range(15):
                v = _l2norm(jnp.matmul(u, w_mat), self.eps)
                u = _l2norm(jnp.matmul(w_mat, v), self.eps)
            u_var.value = jax.lax.stop_gradient(u)
            v_var.value = jax.lax.stop_gradient(v)
        elif update_stats:
            v = _l2norm(jnp.matmul(u, w_mat), self.eps)
            u = _l2norm(jnp.matmul(w_mat, v), self.eps)
            u_var.value = jax.lax.stop_gradient(u)
            v_var.value = jax.lax.stop_gradient(v)
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
        sigma = jnp.dot(u, jnp.matmul(w_mat, v))
        # u/v stay fp32 under bf16 compute (master-precision state); cast
        # sigma down so the normalized kernel keeps the kernel's dtype
        # instead of silently promoting every SN conv to fp32.
        return kernel / sigma.astype(kernel.dtype)


def _l2norm(x, eps):
    return x / (jnp.linalg.norm(x) + eps)


class SNConv2d(nn.Module):
    """Conv2d with spectral-normalized kernel (torch spectral_norm(Conv2d))."""

    features: int
    kernel_size: Union[int, Tuple[int, int]]
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    use_bias: bool = True
    kernel_init: Callable = kaiming_uniform_torch
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.stride)
        ph, pw = _pair(self.padding)
        in_ch = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (kh, kw, in_ch, self.features))
        kernel = SpectralNorm(name="sn")(kernel, update_stats)
        dt = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dt), kernel.astype(dt), (sh, sw), ((ph, ph), (pw, pw)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", bias_uniform_torch(kh * kw * in_ch), (self.features,))
            y = y + bias.astype(dt)
        return y


# --------------------------------------------------------------------------
# Pooling / shuffle / dropout
# --------------------------------------------------------------------------

def max_pool2d(x, kernel: int = 2, stride: int = 2, ceil_mode: bool = False):
    """torch.nn.MaxPool2d on NHWC (ceil_mode pads with -inf on the high side)."""
    b, h, w, c = x.shape
    pad_h = pad_w = 0
    if ceil_mode:
        pad_h = (-(h - kernel) % stride) if (h - kernel) % stride else 0
        pad_w = (-(w - kernel) % stride) if (w - kernel) % stride else 0
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1, kernel, kernel, 1), (1, stride, stride, 1),
        ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
    )


def avg_pool2d(x, kernel: int = 2, stride: Optional[int] = None):
    stride = stride or kernel
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, kernel, kernel, 1), (1, stride, stride, 1),
        "VALID",
    )
    return s / (kernel * kernel)


def pixel_shuffle(x, r: int = 2):
    """torch.nn.PixelShuffle on NHWC: channel c*r*r + i*r + j -> (h*r+i, w*r+j, c)."""
    b, h, w, c = x.shape
    oc = c // (r * r)
    x = x.reshape(b, h, w, oc, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, i, w, j, oc
    return x.reshape(b, h * r, w * r, oc)


def dropout(x, rate: float, deterministic: bool, rng=None):
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, p=keep, shape=x.shape)
    return jnp.where(mask, x / keep, 0.0)
