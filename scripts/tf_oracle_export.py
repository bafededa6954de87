"""Generate golden fixtures by RUNNING the reference implementation.

The reference (/root/reference, TF1) is the behavior contract. This script
executes the reference's own graph code (modules.py / networks.py / train.py
Graph, synthesize.py loop semantics) under a TF1 compatibility shim on a
modern TF2 install, at a tiny configuration matching ``config.test_config()``,
and saves:

* every trainable variable (reference TF names)   -> ``var/<name>``
* the fixed inputs fed to the graph               -> ``in/<name>``
* single-pass layer outputs K,V,Q,R,Y,Z,...       -> ``out/<name>``
* the full reference synthesize.py:45-57 loop     -> ``synth/<name>``
* training losses + clipped gradients (num=1,2)   -> ``loss/``, ``grad/``

The fixture is consumed by ``tests/test_tf_goldens.py`` (pure JAX, no TF
needed at test time). Regenerate only deliberately:

    python scripts/tf_oracle_export.py tests/goldens/tf_reference_tiny.npz

Requires tensorflow (present in the dev image only). The shim reimplements
exactly the TF1 APIs that TF 2.x dropped (tf.contrib.layers.layer_norm with
its 1e-12 epsilon, tf.layers.conv1d/conv2d_transpose/dropout) with the same
variable naming; all composition logic is the reference's own code.
"""
from __future__ import annotations

import os
import sys
import types

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REFERENCE = "/root/reference"


def install_tf1_shim():
    """sys.modules['tensorflow'] -> tf.compat.v1 + contrib/layers shims."""
    import tensorflow as _tf
    v1 = _tf.compat.v1
    v1.disable_eager_execution()
    v1.disable_resource_variables()

    # --- tf.contrib.layers -------------------------------------------------
    def layer_norm(inputs, center=True, scale=True, begin_norm_axis=-1,
                   scope=None, reuse=None):
        # contrib.layers.layer_norm semantics: normalize over axes
        # [begin_norm_axis:], affine params over the trailing dims,
        # variance_epsilon=1e-12, vars beta/gamma in scope (default
        # "LayerNorm"). The reference always calls begin_norm_axis=-1.
        assert begin_norm_axis == -1
        with v1.variable_scope(scope, "LayerNorm", reuse=reuse):
            pshape = inputs.get_shape()[-1:]
            beta = v1.get_variable(
                "beta", pshape, initializer=v1.zeros_initializer()) \
                if center else 0.0
            gamma = v1.get_variable(
                "gamma", pshape, initializer=v1.ones_initializer()) \
                if scale else 1.0
            mean, var = v1.nn.moments(inputs, [inputs.get_shape().ndims - 1],
                                      keepdims=True)
            return v1.nn.batch_normalization(inputs, mean, var, beta, gamma,
                                             1e-12)

    contrib = types.SimpleNamespace(layers=types.SimpleNamespace(
        layer_norm=layer_norm,
        variance_scaling_initializer=(
            lambda *a, **k: v1.variance_scaling_initializer()),
    ))

    # --- tf.layers ---------------------------------------------------------
    def conv1d(inputs, filters, kernel_size, dilation_rate=1,
               padding="valid", use_bias=True, kernel_initializer=None,
               reuse=None, name=None):
        with v1.variable_scope(name or "conv1d", reuse=reuse):
            in_ch = int(inputs.get_shape()[-1])
            kernel = v1.get_variable(
                "kernel", [kernel_size, in_ch, filters],
                initializer=kernel_initializer)
            out = v1.nn.convolution(inputs, kernel, padding=padding.upper(),
                                    dilations=[dilation_rate])
            if use_bias:
                bias = v1.get_variable("bias", [filters],
                                       initializer=v1.zeros_initializer())
                out = v1.nn.bias_add(out, bias)
            return out

    def conv2d_transpose(inputs, filters, kernel_size, strides,
                         padding="same", activation=None,
                         kernel_initializer=None, use_bias=True,
                         name=None, reuse=None):
        assert padding.lower() == "same" and activation is None
        with v1.variable_scope(name or "conv2d_transpose", reuse=reuse):
            in_ch = int(inputs.get_shape()[-1])
            kh, kw = kernel_size
            sh, sw = strides
            kernel = v1.get_variable(
                "kernel", [kh, kw, filters, in_ch],
                initializer=kernel_initializer)
            ish = v1.shape(inputs)
            out_shape = v1.stack([ish[0], ish[1] * sh, ish[2] * sw, filters])
            out = v1.nn.conv2d_transpose(inputs, kernel, out_shape,
                                         strides=[1, sh, sw, 1],
                                         padding="SAME")
            out.set_shape([inputs.get_shape()[0], None, None, filters])
            if use_bias:
                bias = v1.get_variable("bias", [filters],
                                       initializer=v1.zeros_initializer())
                out = v1.nn.bias_add(out, bias)
            return out

    def dropout(inputs, rate=0.5, training=False, name=None):
        if training is False or rate == 0:
            return v1.identity(inputs)
        return v1.nn.dropout(inputs, rate=rate)

    def dense(inputs, units, activation=None, name=None, reuse=None):
        with v1.variable_scope(name or "dense", reuse=reuse):
            in_ch = int(inputs.get_shape()[-1])
            kernel = v1.get_variable("kernel", [in_ch, units])
            bias = v1.get_variable("bias", [units],
                                   initializer=v1.zeros_initializer())
            out = v1.tensordot(inputs, kernel, [[-1], [0]]) + bias
            return activation(out) if activation is not None else out

    v1.contrib = contrib
    v1.layers = types.SimpleNamespace(
        conv1d=conv1d, conv2d_transpose=conv2d_transpose,
        dropout=dropout, dense=dense)
    if not hasattr(v1, "to_float"):
        v1.to_float = lambda x: v1.cast(x, v1.float32)
    if not hasattr(v1, "rsqrt"):
        v1.rsqrt = v1.math.rsqrt

    sys.modules["tensorflow"] = v1
    return v1


def patch_hyperparams_tiny():
    """Patch the reference's global config to config.test_config() values."""
    import hyperparams
    hp = hyperparams.Hyperparams
    hp.sr = 8000
    hp.n_fft = 256
    hp.frame_shift = 8 / 8000.0
    hp.frame_length = 32 / 8000.0
    hp.hop_length = 8
    hp.win_length = 32
    hp.n_mels = 12
    hp.n_iter = 4
    hp.r = 4
    hp.dropout_rate = 0.0
    hp.e = 16
    hp.d = 32
    hp.c = 48
    hp.max_N = 20
    hp.max_T = 24
    hp.B = 2
    return hp


def fixed_inputs(hp, seed=0):
    rng = np.random.RandomState(seed)
    B = hp.B
    # two short "sentences": random in-vocab ids, EOS, zero padding
    L = np.zeros((B, hp.max_N), np.int32)
    lens = [13, 9]
    for b in range(B):
        L[b, :lens[b]] = rng.randint(2, len(hp.vocab), size=lens[b])
        L[b, lens[b]] = 1  # E
    mels = rng.rand(B, hp.max_T, hp.n_mels).astype(np.float32)
    mags = rng.rand(B, hp.max_T * hp.r, hp.n_fft // 2 + 1).astype(np.float32)
    prev = np.array([0, 2], np.int32)
    return L, mels, mags, prev


def main(out_path):
    v1 = install_tf1_shim()
    sys.modules["librosa"] = types.ModuleType("librosa")  # import-time only
    sys.path.insert(0, REFERENCE)
    hp = patch_hyperparams_tiny()

    import train as ref_train  # noqa: E402  (the reference's train.py)

    L, mels, mags, prev = fixed_inputs(hp)
    save = {
        "in/L": L, "in/mels": mels, "in/mags": mags,
        "in/prev_max_attentions": prev,
    }

    # ---- synthesize-mode graph: layer goldens + the reference decode loop
    g1 = v1.Graph()
    with g1.as_default():
        v1.set_random_seed(0)
        g = ref_train.Graph(mode="synthesize")
        with v1.Session() as sess:
            sess.run(v1.global_variables_initializer())
            tvars = v1.trainable_variables()
            # Randomize conv biases (zero-initialized by default): with
            # zero biases, the teacher-forcing zero frame makes every
            # AudioEnc layer-norm see an exactly-zero-variance row, and the
            # reference's OWN gradients overflow to NaN through the stacked
            # 1/sqrt(1e-12) backward factors (empirically verified — the
            # basis for PARITY.md deviation 2). Random biases keep the
            # reference's gradients finite so they can serve as goldens;
            # the weights are exported, so both sides stay identical.
            brng = np.random.RandomState(123)
            sess.run([v.assign(brng.uniform(-0.1, 0.1, v.shape.as_list())
                               .astype(np.float32))
                      for v in tvars if v.name.split(":")[0].endswith("/bias")])
            names = [v.name.split(":")[0] for v in tvars]
            values = sess.run(tvars)
            var_map = dict(zip(names, values))
            for n, val in var_map.items():
                save[f"var/{n}"] = val

            feed = {g.L: L, g.mels: mels, g.prev_max_attentions: prev}
            outs = sess.run(
                {"K": g.K, "V": g.V, "Q": g.Q, "R": g.R,
                 "alignments": g.alignments,
                 "max_attentions": g.max_attentions,
                 "Y_logits": g.Y_logits, "Y": g.Y,
                 "Z_logits": g.Z_logits, "Z": g.Z}, feed)
            for n, val in outs.items():
                save[f"out/{n}"] = val

            # the reference's autoregressive loop, verbatim semantics
            # (synthesize.py:45-57): re-run the full graph every frame,
            # keep only column j, carry the attention cursor.
            Y = np.zeros((L.shape[0], hp.max_T, hp.n_mels), np.float32)
            pma = np.zeros((L.shape[0],), np.int32)
            cursors = np.zeros((L.shape[0], hp.max_T), np.int32)
            for j in range(hp.max_T):
                _Y, _max_att = sess.run(
                    [g.Y, g.max_attentions],
                    {g.L: L, g.mels: Y, g.prev_max_attentions: pma})
                Y[:, j, :] = _Y[:, j, :]
                pma = _max_att[:, j].astype(np.int32)
                cursors[:, j] = pma
            Z = sess.run(g.Z, {g.Y: Y})
            save["synth/Y"] = Y
            save["synth/max_attentions"] = cursors
            save["synth/Z"] = Z

    # ---- training-mode graphs: loss + clipped-gradient goldens
    def fake_get_batch():
        Lp = v1.placeholder(v1.int32, (None, None), name="gold_L")
        melp = v1.placeholder(v1.float32, (None, None, hp.n_mels),
                              name="gold_mels")
        magp = v1.placeholder(v1.float32, (None, None, hp.n_fft // 2 + 1),
                              name="gold_mags")
        fnames = v1.constant(["a", "b"])
        return Lp, melp, magp, fnames, 1

    ref_train.get_batch = fake_get_batch

    for num, tag in ((1, "t2m"), (2, "ssrn")):
        gt = v1.Graph()
        with gt.as_default():
            v1.set_random_seed(0)
            g = ref_train.Graph(num=num, mode="train")
            with v1.Session() as sess:
                sess.run(v1.global_variables_initializer())
                # load the SAME weights as the synthesize graph
                loads = [v.assign(var_map[v.name.split(":")[0]])
                         for v in v1.trainable_variables()]
                sess.run(loads)
                feed = {g.L: L, g.mels: mels, g.mags: mags}
                if num == 1:
                    fetches = {"loss": g.loss, "loss_mels": g.loss_mels,
                               "loss_bd1": g.loss_bd1,
                               "loss_att": g.loss_att}
                else:
                    fetches = {"loss": g.loss, "loss_mags": g.loss_mags,
                               "loss_bd2": g.loss_bd2}
                for n, val in sess.run(fetches, feed).items():
                    save[f"loss/{tag}/{n}"] = val
                gnames = [v.name.split(":")[0] for _, v in g.clipped]
                gvals = sess.run([cg for cg, _ in g.clipped], feed)
                for n, val in zip(gnames, gvals):
                    save[f"grad/{tag}/{n}"] = val

    np.savez_compressed(out_path, **save)
    size = os.path.getsize(out_path)
    print(f"wrote {out_path}: {len(save)} arrays, {size/1024:.0f} KiB")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         os.path.join(HERE, "..", "tests", "goldens",
                      "tf_reference_tiny.npz"))
