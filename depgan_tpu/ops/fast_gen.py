"""FastGenerator — MXU-optimised forward for Gen_UNet2D.

Semantically identical to ``model.apply(vars, x, z, train=False)``
(validated to ~1e-3 by tests/test_fast_gen.py) but restructured for TPU
execution:

- BatchNorm folded into conv/dense/deconv weights (ops/fold_bn.py) — zero
  normalisation passes at runtime;
- the full- and half-resolution stages (32/64 channels — where XLA's conv
  hits ~21/43 TFLOPS on the 128-lane MXU) run in the space-to-depth domain
  (ops/s2d_conv.py) as 2x2 convs over 128/256 channels (~128 TFLOPS);
- max-pools in s2d collapse to channel-group maxes; Conv2DTranspose
  upsamples are the per-pixel matmul of models/blocks.Deconv2x2, emitting
  the next level's s2d layout directly (the pixel-shuffle is free); between
  consecutive Pallas decoder levels the deconv+ReLU runs as one kernel
  (`deconv_s2d_pallas`), and the skip concat is never materialised — the
  first decoder conv consumes (up, skip) as two operands
  (`conv3x3_s2d_fused2`), so the decoder never leaves s2d;
- compute in bfloat16, params float32, head in float32.

Two entry points:

- ``FastGenerator`` (inference): folds/transforms the weights ONCE on the
  host and jits the forward — used by the ensemble predictor
  (eval/predict.py, ``fast=True``) and the benchmark.
- ``FusedGenerator`` (the base spec): ``build_weights`` is pure jnp and
  trace-safe, so a *training* step can rebuild the folded weights from live
  parameters inside jit each superstep (they are a few MB; the fold is
  negligible next to one conv) and run every no-gradient generator forward
  (critic loops, best-of-k probe) through the fused path. Valid whenever
  the generator's BN is frozen — the reference-faithful GAN mode
  (train/gan_trainer.py, ``bn_mode='frozen'``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..config import ModelConfig
from . import s2d_conv as S
from .fold_bn import fold_batch_norms

SITES_IN_ORDER = ("m1", "m2", "m3", "p4", "p3", "p2", "p1")


def _conv(x, w, b):
    y = lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return y + b


def _deconv_matmul(x, kernel, bias):
    """Per-pixel matmul of Deconv2x2; returns UNSHIFTED s2d layout
    (B, N, N, 4O) at the upsampled level."""
    b, h, w, cin = x.shape
    o = kernel.shape[2]
    w2 = jnp.transpose(kernel, (3, 0, 1, 2)).reshape(cin, 4 * o)
    y = jnp.dot(x, w2) + jnp.tile(bias, 4)
    return y  # (B, h, w, 4O) == unshifted s2d of the (2h, 2w, O) output


def _ablate_stub_channels(x, co4: int):
    """Shape-preserving stub for an ablated channel-changing conv: tile or
    slice the channel dim to co4. Costs ~the output's HBM write — the
    ablation delta therefore UNDERestimates the stage by that floor
    (reported by scripts/ablation_forward.py alongside each delta)."""
    c4 = x.shape[-1]
    if co4 == c4:
        return x
    if co4 % c4 == 0:
        return jnp.tile(x, (1, 1, 1, co4 // c4))
    if co4 < c4:
        return x[..., :co4]
    reps = -(-co4 // c4)  # ceil — general tile+slice (e.g. 384 -> 256 fused2)
    return jnp.tile(x, (1, 1, 1, reps))[..., :co4]


def generator_pallas_supported(cfg: ModelConfig) -> bool:
    """Whether the generator's fused Pallas kernels compile for this config
    on real TPU. Mosaic rejects small shapes ('infer-vector-layout:
    unsupported shape cast') — measured envelope on chip (round 3, /tmp
    probe over (image_size, first_fm)): (64, 16) and up compile, (64, 8),
    (32, 8), (16, 4) do not. Interpret mode (CPU) is shape-agnostic."""
    from .conv_s2d_pallas import _interpret

    if _interpret():
        return True
    return cfg.image_size >= 64 and cfg.first_fm >= 16


class FusedGenerator:
    """The fused-forward spec: static level configuration plus trace-safe
    ``build_weights``/``forward``. Carries no parameters itself."""

    def __init__(self, cfg: ModelConfig,
                 s2d_levels: tuple[int, ...] = (),
                 pallas_levels: tuple[int, ...] = (),
                 compute_dtype=jnp.bfloat16):
        self.cfg = cfg
        self.s2d_levels = set(s2d_levels)
        # Levels run through the fused Pallas s2d-conv kernel
        # (ops/conv_s2d_pallas.py). Only worthwhile where XLA's conv starves
        # the MXU (the 32-channel full-resolution level); overrides
        # s2d_levels for those levels.
        self.pallas_levels = set(pallas_levels) - self.s2d_levels
        if self.pallas_levels and not generator_pallas_supported(cfg):
            import warnings

            warnings.warn(
                f"Pallas generator kernels unsupported at image_size="
                f"{cfg.image_size}, first_fm={cfg.first_fm} on this backend "
                f"(Mosaic shape envelope: >= (64, 16)); falling back to the "
                f"XLA fused path.", stacklevel=2,
            )
            self.pallas_levels = set()
        # Perf-bisection switches: restrict the Pallas path to one side.
        self.pallas_encoder = True
        self.pallas_decoder = True
        # Fuse the 1x1 tanh head into the last decoder conv's epilogue
        # (conv3x3_s2d_fused_head). INFERENCE-ONLY (no VJP) and OFF by
        # default everywhere: measured 9% slower than the XLA head at
        # production shapes (see the FastGenerator note below). A/B knob.
        self.fuse_head = False
        # Fuse the encoder pools into the preceding conv kernel's epilogue
        # (conv3x3_s2d_fused_pool): the separate pool_to_s2d/pool_s2d
        # kernels re-read from HBM a plane the conv just had in VMEM
        # (pool_to_s2d measured ~5x its HBM floor, docs/PERF.md round-3
        # roofline). INFERENCE-ONLY (no VJP): off here (FusedGenerator is
        # the differentiable training path); FastGenerator flips it on —
        # on-chip validated at tol 0 and measured +0.5% (2848 vs 2834
        # slices/s, round-4 ab_inference). DEPGAN_FUSE_POOL=0/1 overrides
        # both for A/B.
        import os as _os

        self.fuse_pool = _os.environ.get("DEPGAN_FUSE_POOL") == "1"
        # Chain each whole site (conv_in|fused2 -> film -> conv_out[+pool])
        # into ONE kernel (conv3x3_s2d_chain3): both intermediate planes
        # stay in VMEM, eliminating their HBM store+load pairs — the
        # round-5 lever after all three store/fetch-overlap schemes
        # measured REJECTED (docs/PERF.md). Bit-identical to the
        # sequential kernels (CPU tests + scripts/onchip_validate.py);
        # INFERENCE-ONLY (no VJP). DEPGAN_FUSE_CHAIN=0/1 overrides.
        self.fuse_chain = _os.environ.get("DEPGAN_FUSE_CHAIN") == "1"
        # Run the 1x1 head conv on the bf16 activations (f32 accumulation
        # via preferred_element_type) instead of casting the full 128-ch
        # plane to f32 first: kills the 2x-bytes cast pass + halves the
        # head conv's input traffic (head stage measured 7.2 ms vs a 1.43
        # floor at batch 256, docs/PERF.md round-3 roofline). Numerics: the
        # kernel is bf16-rounded (logit error ~1e-2 scale; same tolerance
        # class as the validated fuse_head kernel). A/B knob, off by
        # default until measured faster AND within eval tolerance on chip.
        self.head_bf16 = _os.environ.get("DEPGAN_HEAD_BF16") == "1"
        # Ablation tags (scripts/ablation_forward.py): trace-time-only knob —
        # components named here are replaced by identity/cheap stubs so the
        # REAL in-graph cost of each stage can be measured by differencing
        # end-to-end forwards (isolated per-stage measurements proved
        # non-additive: docs/PERF.md round 4). Empty in production; checks
        # cost nothing under jit (Python trace time only).
        self.ablate: frozenset = frozenset()
        self.dtype = compute_dtype
        # Row-strip size of the fused conv kernels (perf knob; kernels halve
        # it until it divides the level's block count). 16 measured ~2%
        # faster than 8 end-to-end on v5e (docs/PERF.md round-2 knob sweep).
        self.strip = 16
        # The entry conv's input channels (1 or 2) are zero-padded per s2d
        # group up to this many channels. 8 (32 lanes) measured equal-or-
        # faster than 32 (128 lanes) end-to-end while writing 4x less
        # padded input (Mosaic handles sub-128-lane operands fine).
        self.entry_pad_cin = 8
        # encoder levels: (site, conv_in, conv_out, level)
        self.enc_spec = [
            ("m1", "gen_0", "gen_1", 1),
            ("m2", "gen_2", "gen_3", 2),
            ("m3", "gen_4", "gen_5", 3),
        ]
        self.mid_spec = ("p4", "gen_8", "gen_9", 4)
        self.dec_spec = [
            ("p3", "gen_10", "gen_11", 3, "de_gen_9"),
            ("p2", "gen_14", "gen_15", 2, "de_gen_11"),
            ("p1", "gen_16", "gen_17", 1, "de_gen_15"),
        ]

    # ------------------------------------------------------------- weights

    def build_weights(self, variables: dict) -> dict:
        """Fold BN + apply the s2d kernel transforms; returns the flat
        weight dict ``forward`` consumes. Pure jnp — safe (and
        differentiable) under jit on live parameters."""
        folded = fold_batch_norms(variables)
        p = folded["params"]
        W: dict[str, jnp.ndarray] = {}

        def put(name, arr):
            W[name] = jnp.asarray(arr, dtype=jnp.float32)

        # --- noise encoder ---
        # The 14 per-site FiLM denses all consume the same flattened noise
        # encoding, so they collapse into ONE matmul (the separate 32-128
        # column matmuls cost ~3.3 ms of pure dispatch overhead on the real
        # chip — measured, docs/PERF.md round-2 bisection). Column layout:
        # [mul, add] per site in SITES_IN_ORDER; offsets in _site_slices.
        enc = p["noise_encoder"]
        for name in ("noise_1_add_f0", "noise_1_add_f1"):
            d = enc[name][f"block_{name}"][f"dense_{name}"]
            put(f"{name}/kernel", d["kernel"])
            put(f"{name}/bias", d["bias"])
        site_ks, site_bs, slices, off = [], [], {}, 0
        for site in SITES_IN_ORDER:
            pair = []
            for kind in ("mul", "add"):
                lname = f"noise_2_{kind}" if site == "p4" else f"noise_2_{kind}_{site}"
                d = enc[lname][f"dense_{lname}"]
                site_ks.append(jnp.asarray(d["kernel"]))
                site_bs.append(jnp.asarray(d["bias"]))
                width = site_ks[-1].shape[-1]
                pair.append((off, off + width))
                off += width
            slices[site] = pair
        put("site_mods/kernel", jnp.concatenate(site_ks, axis=-1))
        put("site_mods/bias", jnp.concatenate(site_bs, axis=-1))
        self._site_slices = slices

        # --- conv trunk ---
        def conv_leaf(*path):
            node = p
            for k in path:
                node = node[k]
            return node["kernel"], node["bias"]

        def put_conv(tag, block, lname, level, pad_cin: int | None = None,
                     split_cup: int | None = None):
            if block.startswith("film_"):
                # FilmSite nests its ConvBN one level deeper (models/film.py).
                k, b = conv_leaf(block, lname.replace("conv2d_", "block_"), lname)
            else:
                k, b = conv_leaf(block, lname)
            if level in self.s2d_levels or level in self.pallas_levels:
                if level in self.pallas_levels:
                    # Pixel-domain twins for the encoder/decoder bisection
                    # switches (plain _block falls back to these).
                    put(f"{tag}/kernel_px", k)
                    put(f"{tag}/bias_px", b)
                    if split_cup is not None:
                        # Decoder-entry conv: the concat is never
                        # materialised — conv(concat(up, skip), W) runs as a
                        # two-operand kernel with the rows split here.
                        k4u, b4 = S.conv3x3_to_s2d_kernel_j(
                            jnp.asarray(k[:, :, :split_cup, :]), jnp.asarray(b)
                        )
                        k4s, _ = S.conv3x3_to_s2d_kernel_j(
                            jnp.asarray(k[:, :, split_cup:, :])
                        )
                        put(f"{tag}/kernel_up", k4u)
                        put(f"{tag}/kernel_skip", k4s)
                        put(f"{tag}/bias", b4)
                        return
                if pad_cin is not None and k.shape[2] < pad_cin:
                    k = jnp.pad(
                        k, ((0, 0), (0, 0), (0, pad_cin - k.shape[2]), (0, 0))
                    )
                k4, b4 = S.conv3x3_to_s2d_kernel_j(jnp.asarray(k), jnp.asarray(b))
                put(f"{tag}/kernel", k4)
                put(f"{tag}/bias", b4)
            else:
                put(f"{tag}/kernel", k)
                put(f"{tag}/bias", b)

        for site, cin, cout, level in self.enc_spec + [self.mid_spec]:
            pad_cin = (
                self.entry_pad_cin
                if cin == "gen_0" and level in self.pallas_levels
                else None
            )
            put_conv(cin, f"block_{cin}", f"conv2d_{cin}", level, pad_cin)
            put_conv(f"noise_{site}", f"film_{site}", f"conv2d_gen_noise_{site}", level)
            put_conv(cout, f"block_{cout}", f"conv2d_{cout}", level)
        for site, cin, cout, level, deconv in self.dec_spec:
            d = p[f"block_{deconv}"][f"deconv2d_{deconv}"]
            put(f"{deconv}/kernel", d["kernel"])
            put(f"{deconv}/bias", d["bias"])
            cup = d["kernel"].shape[2]  # deconv output channels = up width
            put_conv(cin, f"block_{cin}", f"conv2d_{cin}", level,
                     split_cup=cup if level in self.pallas_levels else None)
            put_conv(f"noise_{site}", f"film_{site}", f"conv2d_gen_noise_{site}", level)
            put_conv(cout, f"block_{cout}", f"conv2d_{cout}", level)

        seg = p["gen_segmentation"]
        if 1 in self.s2d_levels or 1 in self.pallas_levels:
            k4, b4 = S.conv1x1_to_s2d_kernel_j(
                jnp.asarray(seg["kernel"]), jnp.asarray(seg["bias"])
            )
            put("gen_segmentation/kernel", k4)
            put("gen_segmentation/bias", b4)
            put("gen_segmentation/kernel_px", seg["kernel"])
            put("gen_segmentation/bias_px", seg["bias"])
        else:
            put("gen_segmentation/kernel", seg["kernel"])
            put("gen_segmentation/bias", seg["bias"])
        return W

    # ------------------------------------------------------------- forward

    def _site_mods(self, W, z):
        """Noise pathway (reference :357-395): returns {site: (gamma, beta)}.
        All 14 site denses run as one matmul (see build_weights)."""
        h = z
        for name in ("noise_1_add_f0", "noise_1_add_f1"):
            h = jax.nn.relu(h @ W[f"{name}/kernel"] + W[f"{name}/bias"])
        h = h.reshape(h.shape[0], -1)
        all_mods = h @ W["site_mods/kernel"] + W["site_mods/bias"]
        mods = {}
        for site in SITES_IN_ORDER:
            (m0, m1), (a0, a1) = self._site_slices[site]
            mods[site] = (all_mods[:, m0:m1], all_mods[:, a0:a1])
        return mods

    def _film(self, hn, gamma, beta, s2d: bool):
        if s2d:
            gamma = S.tile_channel_params(gamma)
            beta = S.tile_channel_params(beta)
        return jax.nn.relu(hn * gamma[:, None, None, :] + beta[:, None, None, :])

    def _block_pallas(self, W, x_padded, site, cin_name, cout_name, mods,
                      pool: str = ""):
        """Site chain through the fused Pallas kernel: all three convs +
        bias/relu/FiLM/residual epilogues, activations in padded s2d.
        ``pool`` ('s2d'|'pixel', fuse_pool knob) makes the LAST conv also
        emit its 2x2 max-pool from the same VMEM pass; returns (h1, pooled)
        then instead of h1."""
        from .conv_s2d_pallas import (
            conv3x3_s2d_chain3,
            conv3x3_s2d_fused,
            conv3x3_s2d_fused_pool,
        )

        dt = self.dtype
        gamma, beta = mods[site]
        if self.fuse_chain and not self.ablate:
            return conv3x3_s2d_chain3(
                x_padded,
                W[f"{cin_name}/kernel"].astype(dt), W[f"{cin_name}/bias"],
                W[f"noise_{site}/kernel"].astype(dt), W[f"noise_{site}/bias"],
                S.tile_channel_params(gamma), S.tile_channel_params(beta),
                W[f"{cout_name}/kernel"].astype(dt), W[f"{cout_name}/bias"],
                strip=self.strip, pool=pool,
            )
        if f"conv_in:{site}" in self.ablate:
            co4 = W[f"{cin_name}/kernel"].shape[-1]
            h0 = _ablate_stub_channels(x_padded, co4)
        else:
            h0 = conv3x3_s2d_fused(
                x_padded, W[f"{cin_name}/kernel"].astype(dt), W[f"{cin_name}/bias"],
                mode="relu", strip=self.strip,
            )
        if f"film:{site}" in self.ablate:
            site_out = h0  # film conv keeps channels: exact identity ablation
        else:
            site_out = conv3x3_s2d_fused(
                h0, W[f"noise_{site}/kernel"].astype(dt), W[f"noise_{site}/bias"],
                S.tile_channel_params(gamma), S.tile_channel_params(beta),
                mode="film", strip=self.strip,
            )
        if pool:
            return conv3x3_s2d_fused_pool(
                site_out, W[f"{cout_name}/kernel"].astype(dt),
                W[f"{cout_name}/bias"], mode="relu", strip=self.strip,
                pool=pool,
            )
        if f"conv_out:{site}" in self.ablate:
            return site_out  # encoder conv_out keeps channels
        h1 = conv3x3_s2d_fused(
            site_out, W[f"{cout_name}/kernel"].astype(dt), W[f"{cout_name}/bias"],
            mode="relu", strip=self.strip,
        )
        return h1

    def _block_pallas2(self, W, up, skip, site, cin_name, cout_name, mods,
                       head=False):
        """Decoder site chain: the first conv consumes (up, skip) as two
        operands (conv3x3_s2d_fused2) so the skip concat never exists in
        HBM; then FiLM + conv as in _block_pallas. ``head=True`` fuses the
        1x1 tanh head into the last conv's epilogue (inference only) and
        returns the UNPADDED tanh'd s2d head output instead."""
        from .conv_s2d_pallas import (
            conv3x3_s2d_chain3,
            conv3x3_s2d_fused,
            conv3x3_s2d_fused2,
            conv3x3_s2d_fused_head,
        )

        dt = self.dtype
        gamma, beta = mods[site]
        if self.fuse_chain and not head and not self.ablate:
            return conv3x3_s2d_chain3(
                up,
                W[f"{cin_name}/kernel_up"].astype(dt),
                W[f"{cin_name}/bias"],
                W[f"noise_{site}/kernel"].astype(dt), W[f"noise_{site}/bias"],
                S.tile_channel_params(gamma), S.tile_channel_params(beta),
                W[f"{cout_name}/kernel"].astype(dt), W[f"{cout_name}/bias"],
                x2_padded=skip, w1b4=W[f"{cin_name}/kernel_skip"].astype(dt),
                strip=self.strip,
            )
        if f"fused2:{site}" in self.ablate:
            co4 = W[f"{cin_name}/kernel_up"].shape[-1]
            h0 = _ablate_stub_channels(up, co4)
        else:
            h0 = conv3x3_s2d_fused2(
                up, skip,
                W[f"{cin_name}/kernel_up"].astype(dt),
                W[f"{cin_name}/kernel_skip"].astype(dt),
                W[f"{cin_name}/bias"], strip=self.strip,
            )
        if f"film:{site}" in self.ablate:
            site_out = h0
        else:
            site_out = conv3x3_s2d_fused(
                h0, W[f"noise_{site}/kernel"].astype(dt), W[f"noise_{site}/bias"],
                S.tile_channel_params(gamma), S.tile_channel_params(beta),
                mode="film", strip=self.strip,
            )
        if head:
            return conv3x3_s2d_fused_head(
                site_out,
                W[f"{cout_name}/kernel"].astype(dt), W[f"{cout_name}/bias"],
                W["gen_segmentation/kernel"], W["gen_segmentation/bias"],
                strip=self.strip,
            )
        if f"conv_out:{site}" in self.ablate:
            return site_out  # decoder conv_out keeps channels
        h1 = conv3x3_s2d_fused(
            site_out, W[f"{cout_name}/kernel"].astype(dt), W[f"{cout_name}/bias"],
            mode="relu", strip=self.strip,
        )
        return h1

    def _block(self, W, x_in, site, cin_name, cout_name, mods, s2d: bool):
        """conv_in -> FiLM site -> conv_out. s2d: x_in is SHIFTED s2d;
        returns UNSHIFTED s2d. plain: pixel domain in/out."""
        dt = self.dtype
        gamma, beta = mods[site]
        if s2d:
            h0 = jax.nn.relu(S.conv2x2_s2d(x_in, W[f"{cin_name}/kernel"].astype(dt),
                                           W[f"{cin_name}/bias"].astype(dt)))
            hn = S.conv2x2_s2d(S.u2s(h0), W[f"noise_{site}/kernel"].astype(dt),
                               W[f"noise_{site}/bias"].astype(dt))
            s = h0 + self._film(hn, gamma.astype(dt), beta.astype(dt), True)
            h1 = jax.nn.relu(S.conv2x2_s2d(S.u2s(s), W[f"{cout_name}/kernel"].astype(dt),
                                           W[f"{cout_name}/bias"].astype(dt)))
        else:
            def kb(name):
                if f"{name}/kernel_px" in W:
                    return W[f"{name}/kernel_px"].astype(dt), W[f"{name}/bias_px"].astype(dt)
                return W[f"{name}/kernel"].astype(dt), W[f"{name}/bias"].astype(dt)

            h0 = jax.nn.relu(_conv(x_in, *kb(cin_name)))
            hn = _conv(h0, *kb(f"noise_{site}"))
            s = h0 + self._film(hn, gamma.astype(dt), beta.astype(dt), False)
            h1 = jax.nn.relu(_conv(s, *kb(cout_name)))
        return h1

    def forward(self, W, x, z):
        dt = self.dtype
        mods = self._site_mods(W, z.astype(jnp.float32))
        x = x.astype(dt)

        from .conv_s2d_pallas import (
            deconv_s2d_pallas,
            entry_pack,
            pad_s2d,
            pool_s2d_pallas,
            pool_to_s2d_pallas,
            unpad_s2d,
        )

        skips = {}  # level -> (tensor, layout) with layout in
        # {'pixel', 's2d' (unshifted), 'padded' (padded s2d)}
        h = x
        h_layout = "pixel"
        for site, cin, cout, level in self.enc_spec:
            s2d = level in self.s2d_levels
            if level in self.pallas_levels and self.pallas_encoder:
                if h_layout == "padded":
                    x_in = h  # previous pallas level's pool emitted our layout
                elif cin == "gen_0" and h.shape[-1] <= self.entry_pad_cin:
                    x_in = entry_pack(h, c_pad=self.entry_pad_cin)
                else:
                    x_in = pad_s2d(S.s2d_unshifted(h))
                next_pallas = (level + 1) in self.pallas_levels
                if self.fuse_pool:
                    # The last conv emits its own pool from VMEM — the
                    # separate relayout kernel (and its HBM re-read of the
                    # skip plane) disappears.
                    h1, pooled = self._block_pallas(
                        W, x_in, site, cin, cout, mods,
                        pool="s2d" if next_pallas else "pixel",
                    )
                    skips[level] = (h1, "padded")
                    h, h_layout = pooled, ("padded" if next_pallas else "pixel")
                    continue
                h1 = self._block_pallas(W, x_in, site, cin, cout, mods)
                skips[level] = (h1, "padded")
                if f"pool:{site}" in self.ablate:
                    n = h1.shape[1] - 2
                    if next_pallas:  # pooled padded s2d: n/2+2 spatial, same c4
                        h, h_layout = h1[:, : n // 2 + 2, : n // 2 + 2, :], "padded"
                    else:  # pixel-domain pool: n x n spatial, c = c4 // 4
                        h = h1[:, 1 : n + 1, 1 : n + 1, : h1.shape[-1] // 4]
                        h_layout = "pixel"
                elif next_pallas:
                    # Pool straight into the next level's padded s2d layout.
                    h, h_layout = pool_to_s2d_pallas(h1), "padded"
                else:
                    h, h_layout = pool_s2d_pallas(h1), "pixel"
                continue
            if h_layout == "padded":
                h, h_layout = S.d2s(unpad_s2d(h)), "pixel"
            x_in = S.s2d_shifted(h) if s2d else h
            h1 = self._block(W, x_in, site, cin, cout, mods, s2d)
            skips[level] = (h1, "s2d" if s2d else "pixel")
            if s2d:
                h, h_layout = S.pool2x2_s2d(h1), "pixel"
            else:
                from flax import linen as nn

                h, h_layout = nn.max_pool(h1, (2, 2), (2, 2)), "pixel"

        # bottleneck (always pixel domain; 128ch tiles the MXU fine)
        site, cin, cout, _ = self.mid_spec
        h = self._block(W, h, site, cin, cout, mods, False)

        def skip_as(level, want):
            """Skip tensor converted to the requested layout."""
            t, kind = skips[level]
            if kind == want:
                return t
            if kind == "padded":
                t, kind = unpad_s2d(t), "s2d"
            if kind == "pixel" and want in ("s2d", "padded"):
                t, kind = S.s2d_unshifted(t), "s2d"
            if kind == "s2d" and want == "pixel":
                return S.d2s(t)
            if kind == "s2d" and want == "padded":
                return pad_s2d(t)
            return t

        h_layout = "pixel"  # mid block output
        head_fused = False
        for site, cin, cout, level, deconv in self.dec_spec:
            s2d = level in self.s2d_levels
            k = W[f"{deconv}/kernel"].astype(dt)
            b = W[f"{deconv}/bias"].astype(dt)
            if level in self.pallas_levels and self.pallas_decoder:
                if f"deconv:{site}" in self.ablate:
                    # Stub: emit a correctly-shaped padded-s2d plane whose
                    # cost is ~its HBM write. It MUST depend on h — a
                    # constant stub lets XLA dead-code-eliminate everything
                    # upstream that only feeds the deconv (the entire mid
                    # network), which inflated the round-4 ablation's
                    # deconv delta to +50 ms.
                    n2 = h.shape[1] - 2
                    up4 = k.shape[2] * 4  # deconv out channels, s2d c4
                    hm = jnp.mean(h, axis=(1, 2, 3), keepdims=True)
                    up = jnp.broadcast_to(
                        hm.astype(h.dtype),
                        (h.shape[0], 2 * n2 + 2, 2 * n2 + 2, up4),
                    )
                elif h_layout == "padded":
                    # Previous Pallas decoder level: deconv + relu straight
                    # from (and back to) padded s2d in one kernel.
                    cin_ch = k.shape[3]
                    w2 = jnp.transpose(k, (3, 0, 1, 2)).reshape(cin_ch, -1)
                    up = deconv_s2d_pallas(h, w2, jnp.tile(b, 4))
                else:
                    up = pad_s2d(jax.nn.relu(_deconv_matmul(h, k, b)))
                head_fused = (
                    level == 1 and self.fuse_head and self.cfg.n_out == 1
                )
                h, h_layout = self._block_pallas2(
                    W, up, skip_as(level, "padded"), site, cin, cout, mods,
                    head=head_fused,
                ), "padded"
                next_pallas = (level - 1) in self.pallas_levels and self.pallas_decoder
                if level > 1 and not next_pallas:
                    h, h_layout = S.d2s(unpad_s2d(h)), "pixel"
                continue
            if h_layout == "padded":
                h, h_layout = S.d2s(unpad_s2d(h)), "pixel"
            up = jax.nn.relu(_deconv_matmul(h, k, b))  # unshifted s2d @ level
            if s2d:
                cat = S.concat_s2d(up, skip_as(level, "s2d"))
                x_in = S.u2s(cat)
                h = self._block(W, x_in, site, cin, cout, mods, True)
            else:
                up_px = S.d2s(up)
                cat = jnp.concatenate([up_px, skip_as(level, "pixel")], axis=-1)
                h = self._block(W, cat, site, cin, cout, mods, False)
            if s2d and level > 1:
                h = S.d2s(h)  # next deconv consumes the pixel domain

        if head_fused:
            # The last decoder kernel already applied the 1x1 head + tanh
            # (unpadded s2d, f32) — only the pixel relayout remains.
            return S.d2s(h)

        # head — h is padded-s2d only when the level-1 decoder ran on the
        # pallas path; pixel otherwise.
        if "head" in self.ablate:
            # Cheap stub: channel mean + tanh at the head's output shape
            # (reads the plane once; no f32 cast pass, no 1x1 conv).
            hm = jnp.mean(h, axis=-1, keepdims=True).astype(jnp.float32)
            if 1 in self.pallas_levels and self.pallas_decoder:
                nn_ = h.shape[1] - 2  # rows: h may carry STREAM_OUT pad cols
                hm = hm[:, 1 : nn_ + 1, 1 : nn_ + 1, :]
                hm = S.d2s(jnp.tile(hm, (1, 1, 1, 4)))  # 1-ch s2d stand-in
            return jnp.tanh(hm[..., : max(self.cfg.n_out, 1)])
        head_s2d_padded = 1 in self.pallas_levels and self.pallas_decoder
        head_s2d = 1 in self.s2d_levels
        if head_s2d_padded or head_s2d:
            kseg = W["gen_segmentation/kernel"].astype(jnp.float32)
            bseg = W["gen_segmentation/bias"].astype(jnp.float32)
        else:
            key = "gen_segmentation/kernel_px" if "gen_segmentation/kernel_px" in W else "gen_segmentation/kernel"
            kseg = W[key].astype(jnp.float32)
            bseg = W[key.replace("kernel", "bias")].astype(jnp.float32)
        if self.head_bf16:
            logits = lax.conv_general_dilated(
                h.astype(dt), kseg.astype(dt), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ) + bseg
        else:
            h = h.astype(jnp.float32)
            logits = lax.conv_general_dilated(
                h, kseg, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")
            ) + bseg
        if head_s2d_padded:
            logits = S.d2s(unpad_s2d(logits))
        elif head_s2d:
            logits = S.d2s(logits)
        if self.cfg.n_out == 1:
            return jnp.tanh(logits)
        return jax.nn.softmax(logits, axis=-1)

    # Backwards-compatible alias (benchmarks and older call sites).
    _forward = forward


class FastGenerator(FusedGenerator):
    """Inference wrapper: precomputes the transformed weights once on the
    host and exposes a jitted ``__call__``."""

    def __init__(self, cfg: ModelConfig, variables: dict,
                 s2d_levels: tuple[int, ...] = (),
                 pallas_levels: tuple[int, ...] = (),
                 compute_dtype=jnp.bfloat16):
        super().__init__(cfg, s2d_levels=s2d_levels, pallas_levels=pallas_levels,
                         compute_dtype=compute_dtype)
        # fuse_head stays False (the FusedGenerator default): fusing the 1x1
        # tanh head into the last decoder kernel MEASURED 9% SLOWER on chip
        # (2573 vs 2835 slices/s, scripts/ab_inference.py) — the (., 128) @
        # (128, 4) head matmul is MXU-starved per strip and the 4-lane
        # store pays a 32x lane-padding tax, while the XLA head conv over
        # the dense d2s output fuses with its neighbours for free. The
        # kernel is kept (on-chip validated) as an A/B knob.
        # Inference default: fused encoder pools (no VJP needed here).
        # Measured winner on chip (round-4 ab_inference: 2848 vs 2834
        # slices/s) and on-chip validated at tol 0; DEPGAN_FUSE_POOL=0
        # restores the separate relayout kernels for A/B.
        import os as _os

        if "DEPGAN_FUSE_POOL" not in _os.environ:
            self.fuse_pool = True
        host_vars = jax.tree.map(np.asarray, variables)
        self.weights = jax.tree.map(jnp.asarray, self.build_weights(host_vars))
        self._jit_forward = jax.jit(self.forward)

    def __call__(self, x, z):
        return self._jit_forward(self.weights, x, z)
