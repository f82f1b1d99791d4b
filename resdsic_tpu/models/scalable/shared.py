"""Scalable (base + progressive) WACNN, shared progressive entropy plumbing.

Parity target: src/compress/models/WACNN/scalable/shared.py
(ResWACNNSharedEntropy, 660 LoC): a second analysis transform
`g_a_progressive` consumes the intermediate g_a feature (↓8, N channels)
rearranged to image resolution and concatenated with the input (T = N/64 + 3
channels); the progressive latent gets its own EntropyBottleneck /
GaussianConditional but — in this *shared* variant — REUSES h_a /
h_mean_s / h_scale_s and the cc/lrp transforms of the base branch
(ref shared.py:277-285).

Layout note (documented divergence): the reference "reshape" of y_base from
(N, h/8, w/8) to (N/64, h, w) is a raw channel-major memory reinterpretation
(shared.py:185-189). We use a proper depth-to-space (pixel shuffle, r=8) —
the same shape and information content, but a spatially-coherent
rearrangement that is layout-natural in NHWC. No public checkpoints exist
for the scalable family, so there is no conversion-fidelity constraint here.

Forward returns stacked multi-quality outputs exactly like the reference
(x_hat: (num_q, B, H, W, 3); base y likelihood counted once).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...entropy import (
    EntropyBottleneck,
    GaussianConditional,
    gc_build_indexes,
    quantize_symbols,
)
from ...nn import GDN, Conv, WinNoShiftAttention
from ...ops.math import ste_round
from ..wacnn import WACNN


class ResWACNNSharedEntropy(WACNN):
    """Two-layer scalable codec, shared prog hyper/cc plumbing."""

    mask_policy: str = "learnable-mask"
    lmbda_list: Tuple[float, ...] = (0.0035, 0.065)
    lrp_prog: bool = True
    independent_lrp: bool = False
    multiple_decoder: bool = False

    # progressive-input geometry (ref shared.py:38-42)
    @property
    def halve(self) -> int:
        return 8

    @property
    def level(self) -> int:
        """g_a split point: layers [:level+1] produce the ↓8 feature."""
        return 5

    @property
    def factor(self) -> int:
        return self.halve**2

    @property
    def split_channels(self) -> int:
        """Channel width of the g_a feature at the split point."""
        return self.N

    @property
    def T(self) -> int:
        return self.split_channels // self.factor + 3

    @property
    def scalable_levels(self) -> int:
        return len(self.lmbda_list)

    @property
    def lmbda_index_list(self) -> Dict[float, int]:
        return dict(zip(self.lmbda_list, range(len(self.lmbda_list))))

    def setup(self):
        super().setup()
        N, M, dt = self.N, self.M, self.dtype
        assert self.split_channels % self.factor == 0

        self.g_a_progressive = self._build_g_a_progressive()

        self.entropy_bottleneck_prog = EntropyBottleneck(channels=self.hyper_channels)
        self.gaussian_conditional_prog = GaussianConditional()

        if self.mask_policy == "learnable-mask":
            self.gamma = self.param(
                "gamma",
                lambda k, s: jnp.ones(s, jnp.float32),
                (self.scalable_levels - 1, M),
            )
            self.mask_conv = Conv(M, kernel_size=1, stride=1, dtype=dt)

    def _build_g_a_progressive(self):
        N, M, dt = self.N, self.M, self.dtype
        return [
            Conv(N, kernel_size=5, stride=2, dtype=dt),
            GDN(dtype=dt),
            Conv(N, kernel_size=5, stride=2, dtype=dt),
            GDN(dtype=dt),
            WinNoShiftAttention(dim=N, num_heads=8, window_size=8, shift_size=4, dtype=dt),
            Conv(N, kernel_size=5, stride=2, dtype=dt),
            GDN(dtype=dt),
            Conv(M, kernel_size=5, stride=2, dtype=dt),
        ]

    # ---- overridable progressive plumbing (shared variant reuses base) ----

    def _h_a_prog(self, y_prog: jax.Array) -> jax.Array:
        return self._seq(self.h_a, y_prog)

    def _hyper_synth_prog(self, z_hat_prog) -> Tuple[jax.Array, jax.Array]:
        # deterministic island (see WACNN._iso): prog hyper outputs feed
        # decoder-side mu/scale and must be bit-identical across programs
        z_hat_prog = self._iso(z_hat_prog)
        out = (
            self._seq(self.h_mean_s, z_hat_prog),
            self._seq(self.h_scale_s, z_hat_prog),
        )
        return self._iso(out)

    def _cc_prog(self, i: int):
        return self.cc_mean_transforms[i], self.cc_scale_transforms[i]

    def _lrp_prog_stack(self, i: int):
        return self.lrp_transforms[i]

    # ---- geometry helpers ----

    def split_ga(self, x: jax.Array, begin: bool = True) -> jax.Array:
        """First/second half of g_a around the ↓8 feature (ref shared.py:118-124)."""
        if begin:
            return self._seq(self.g_a[: self.level + 1], x)
        return self._seq(self.g_a[self.level + 1 :], x)

    def concatenate(self, y_base: jax.Array, x: jax.Array) -> jax.Array:
        """Rearrange y_base (↓8, N ch) to image res (N/64 ch) and concat x."""
        from ...nn import pixel_shuffle

        up = pixel_shuffle(y_base, self.halve)
        return jnp.concatenate([up, x.astype(up.dtype)], axis=-1)

    # ---- quality / mask handling ----

    def normalize_quality(self, quality) -> float:
        """Map a lambda value to its level index; pass through raw values."""
        idx = self.lmbda_index_list
        if quality in idx:
            return idx[quality]
        return quality

    def define_quality(self, quality) -> list:
        if quality is None:
            return list(self.lmbda_list)
        if isinstance(quality, (list, tuple)):
            return list(quality)
        return [quality]

    def extract_mask(
        self, scale: jax.Array, q: float, training: bool = False
    ) -> jax.Array:
        """Latent masking policies (ref shared.py:191-229); q is the RAW
        quality value exactly as the reference passes it (shared.py:300):
        point-based-std consumes it directly as a quantile fraction (x0.1,
        ref shared.py:197) — a lambda value or the fractional test grid
        [0, 0.5, 0.4, ...] is NOT index-normalized first. The learnable /
        two-level policies consume the level index, so lambda values are
        mapped through lmbda_index_list (the reference does the same lookup
        at shared.py:211; its raw `pr == 0` guard crashes torch.stack on the
        first lambda — repaired here by normalizing before the guard)."""
        if self.mask_policy == "point-based-std":
            pr = q * 0.1
            quantile = jnp.quantile(scale.astype(jnp.float32).ravel(), pr)
            return (scale >= quantile).astype(jnp.float32)
        q = self.normalize_quality(q)
        if self.mask_policy == "learnable-mask":
            if q == 0:
                return jnp.zeros_like(scale)
            if q == self.scalable_levels - 1:
                return jnp.ones_like(scale)
            importance = jnp.clip(self.mask_conv(scale) + 0.5, 0.0, 1.0)
            gamma = jax.nn.relu(jnp.sum(self.gamma[: int(q)], axis=0))
            mask = jnp.power(importance, gamma[None, None, None, :])
            if training:
                noise = jax.random.uniform(
                    self.make_rng("noise"), mask.shape, mask.dtype, -0.5, 0.5
                )
                samples = mask + noise
                return ste_round(samples)
            return jnp.round(mask)
        if self.mask_policy == "all-one":
            return jnp.ones_like(scale)
        if self.mask_policy == "all-zero":
            return jnp.zeros_like(scale)
        if self.mask_policy == "two-levels":
            if q == 0:
                return jnp.zeros_like(scale)
            return jnp.ones_like(scale)
        raise NotImplementedError(self.mask_policy)

    # ---- multi-quality forward (training / entropy estimation) ----

    def __call__(
        self, x: jax.Array, quality=None, training: bool = False
    ) -> Dict[str, Any]:
        list_quality = self.define_quality(quality)

        y_base = self.split_ga(x)
        y = self.split_ga(y_base, begin=False)

        y_progressive_support = self.concatenate(y_base, x)
        y_progressive = self._seq(self.g_a_progressive, y_progressive_support)

        z = self._seq(self.h_a, y)
        _, z_likelihoods = self.entropy_bottleneck(z, training=training)
        medians = self.entropy_bottleneck.medians()
        z_hat = ste_round(z - medians) + medians

        latent_means, latent_scales = self._hyper_out(z_hat)

        z_prog = self._h_a_prog(y_progressive)
        _, z_likelihoods_prog = self.entropy_bottleneck_prog(
            z_prog, training=training
        )
        medians_prog = self.entropy_bottleneck_prog.medians()
        z_hat_prog = ste_round(z_prog - medians_prog) + medians_prog
        means_prog, scales_prog = self._hyper_synth_prog(z_hat_prog)

        sc = self.slice_ch
        y_likelihood_main = []
        y_likelihoods_progressive = []
        x_hats, y_hats = [], []

        for j, p in enumerate(list_quality):
            q = self.normalize_quality(p)

            # coding-mask hook — None in shared/ind (mask dead in coding,
            # ref independent.py:401-404), a real mask in the icd family
            mask = self._prog_mask(latent_scales, scales_prog, q, training)

            y_hat_slices, y_hat_prog, y_hat_complete = [], [], []
            y_likelihood_prog = []

            for i in range(self.num_slices):
                y_slice = y[..., i * sc : (i + 1) * sc]
                support = self._support(y_hat_slices)
                mu, scale, mean_support = self._slice_mu_scale(
                    i, latent_means, latent_scales, support
                )
                _, lik = self.gaussian_conditional(
                    y_slice, scale, mu, training=training
                )
                if j == 0:
                    y_likelihood_main.append(lik)

                y_hat_slice = ste_round(y_slice - mu) + mu
                y_hat_slice = y_hat_slice + self._lrp(i, mean_support, y_hat_slice)
                y_hat_slices.append(y_hat_slice)

                if q != 0:
                    y_prog_slice = y_progressive[..., i * sc : (i + 1) * sc]
                    support_prog = self._support(y_hat_prog)
                    mu_p, scale_p, mean_support_p = self._slice_mu_scale_prog(
                        i, means_prog, scales_prog, support_prog
                    )
                    if mask is not None:
                        block_mask = mask[..., i * sc : (i + 1) * sc]
                        _, lik_p = self.gaussian_conditional_prog(
                            y_prog_slice, scale_p * block_mask, mu_p,
                            training=training,
                        )
                        y_hat_p = (
                            ste_round(y_prog_slice - mu_p) * block_mask + mu_p
                        )
                    else:
                        _, lik_p = self.gaussian_conditional_prog(
                            y_prog_slice, scale_p, mu_p, training=training
                        )
                        y_hat_p = ste_round(y_prog_slice - mu_p) + mu_p
                    y_likelihood_prog.append(lik_p)

                    if self.lrp_prog:
                        y_hat_p = y_hat_p + self._lrp_prog(
                            i, mean_support_p, y_hat_p
                        )
                    y_hat_prog.append(y_hat_p)
                    y_hat_complete.append(self._merge(y_hat_slice, y_hat_p, i))
                else:
                    y_hat_complete.append(y_hat_slice)

            y_hat_q = self._final_latent(y_hat_complete, y_hat_prog, q)
            x_hat_q = self._synthesize_q(y_hat_q, q)
            y_hats.append(y_hat_q)
            x_hats.append(x_hat_q)
            if q != 0:
                y_likelihoods_progressive.append(
                    jnp.concatenate(y_likelihood_prog, axis=-1)
                )

        x_hat_progressive = jnp.stack(x_hats, axis=0)
        y_likelihoods = jnp.concatenate(y_likelihood_main, axis=-1)[None]
        if y_likelihoods_progressive:
            y_likelihoods_prog = jnp.stack(y_likelihoods_progressive, axis=0)
        else:
            y_likelihoods_prog = jnp.ones_like(y_likelihoods)

        out = {
            "x_hat": x_hat_progressive,
            "likelihoods": {
                "y": y_likelihoods,
                "z": z_likelihoods,
                "z_prog": z_likelihoods_prog,
                "y_prog": y_likelihoods_prog,
            },
            "z_hat": z_hat,
            "z_hat_prog": z_hat_prog,
        }
        # per-quality latents can differ in width (cimd 'concatenation');
        # only stack when homogeneous
        if len({v.shape for v in y_hats}) == 1:
            out["y"] = jnp.stack(y_hats, axis=0)
        return out

    # ---- overridable coding hooks (icd/cicd families override) ----

    def _prog_mask(self, latent_scales, scales_prog, q, training):
        """Coding mask; None = mask not applied (shared/ind variants)."""
        return None

    def _merge(self, y_hat_slice, y_hat_prog_slice, slice_index: int):
        """Base+prog slice combination; cicd overrides with joiner policies."""
        return y_hat_slice + y_hat_prog_slice

    def _final_latent(self, y_hat_complete, y_hat_prog, q):
        """Final latent fed to g_s; cimd 'concatenation' overrides."""
        return jnp.concatenate(y_hat_complete, axis=-1)

    # prog-side mu/scale (shared cc transforms; overridden in independent)
    def _slice_mu_scale_prog(self, idx, means_prog, scales_prog, support):
        means_prog, scales_prog, support = self._iso(
            (means_prog, scales_prog, list(support))
        )
        mean_support = jnp.concatenate([means_prog] + support, axis=-1)
        scale_support = jnp.concatenate([scales_prog] + support, axis=-1)
        cc_mean, cc_scale = self._cc_prog(idx)
        mu = self._seq(cc_mean, mean_support)
        scale = self._seq(cc_scale, scale_support)
        mu, scale = self._iso((mu, scale))
        return mu, scale, mean_support

    def _lrp_prog(self, idx, mean_support, y_hat_slice):
        mean_support, y_hat_slice = self._iso((mean_support, y_hat_slice))
        lrp_support = jnp.concatenate([mean_support, y_hat_slice], axis=-1)
        lrp = self._seq(self._lrp_prog_stack(idx), lrp_support)
        return self._iso(0.5 * jnp.tanh(lrp))

    def _coding_mask(self, latent_scales, scales_prog, q):
        """Deterministic island for the coding mask: it gates rows on both
        sides of the coded paths, so a 1-ulp divergence desyncs streams."""
        latent_scales, scales_prog = self._iso((latent_scales, scales_prog))
        return self._iso(
            jnp.round(self.masking(latent_scales, scale_prog=scales_prog, pr=q))
        )

    def _synthesize_q(self, y_hat: jax.Array, q) -> jax.Array:
        """Decoder selection point; single decoder here (ref shared)."""
        return self._seq(self.g_s, y_hat)

    def aux_loss(self) -> jax.Array:
        """Sum of both EB quantile losses (ref shared.py:77-87)."""
        return (
            self.entropy_bottleneck.aux_loss()
            + self.entropy_bottleneck_prog.aux_loss()
        )

    # ---------------- codec device programs ----------------

    def analyze_scalable(
        self, x: jax.Array, with_prog: bool = True
    ) -> Dict[str, jax.Array]:
        """Encoder-private analysis: base + (optionally) progressive latents."""
        y_base = self.split_ga(x)
        y = self.split_ga(y_base, begin=False)
        z = self._seq(self.h_a, y)
        medians = self.entropy_bottleneck.medians()
        out = {
            "y": y,
            "z_symbols": quantize_symbols(z, jnp.broadcast_to(medians, z.shape)),
        }
        if with_prog:
            y_progressive = self._seq(
                self.g_a_progressive, self.concatenate(y_base, x)
            )
            z_prog = self._h_a_prog(y_progressive)
            medians_p = self.entropy_bottleneck_prog.medians()
            out["y_prog"] = y_progressive
            out["z_prog_symbols"] = quantize_symbols(
                z_prog, jnp.broadcast_to(medians_p, z_prog.shape)
            )
        return out

    def hyper_synthesis_prog(self, z_hat_prog: jax.Array):
        means_prog, scales_prog = self._hyper_synth_prog(z_hat_prog)
        return means_prog, scales_prog

    def slice_params_prog(
        self, slice_index: int, means_prog, scales_prog, support,
        block_mask=None,
    ):
        mu, scale, _ = self._slice_mu_scale_prog(
            slice_index, means_prog, scales_prog, list(support)
        )
        if block_mask is not None:
            scale = scale * block_mask
        indexes = gc_build_indexes(scale, self._scale_table())
        return mu, scale, indexes

    def quantize_slice_prog(self, slice_index: int, y_prog, mu, block_mask=None):
        sc = self.slice_ch
        y_slice = y_prog[..., slice_index * sc : (slice_index + 1) * sc]
        if block_mask is not None:
            # icd semantics (single_decoder.py:613-620): quantize the MASKED
            # zero-mean residual
            return jnp.clip(quantize_symbols((y_slice - mu) * block_mask), -127, 127)
        return jnp.clip(quantize_symbols(y_slice, mu), -127, 127)

    def compute_mask(self, latent_scales, scales_prog, q) -> jax.Array:
        """Rounded coding mask for the codec driver (icd family)."""
        raise NotImplementedError("model has no coding mask")

    def merge_slices(self, slice_index: int, y_main, y_prog):
        """Jittable merge for the decoder (cicd overrides via _merge)."""
        return self._merge(y_main, y_prog, slice_index)

    def final_latent_device(self, y_hat_complete, y_hat_prog, q_is_zero: bool):
        return self._final_latent(
            list(y_hat_complete), list(y_hat_prog), 0 if q_is_zero else 1
        )

    @property
    def uses_coding_mask(self) -> bool:
        return False

    def slice_reconstruct_prog(
        self, slice_index: int, symbols, mu, means_prog, support
    ):
        y_hat = symbols.astype(jnp.float32) + mu
        if self.lrp_prog:
            mean_support = jnp.concatenate([means_prog] + list(support), axis=-1)
            y_hat = y_hat + self._lrp_prog(slice_index, mean_support, y_hat)
        return y_hat

    def synthesize_scalable(self, y_hat: jax.Array, q_is_zero: bool) -> jax.Array:
        return jnp.clip(self._synthesize_q(y_hat, 0 if q_is_zero else 1), 0.0, 1.0)

    # ---------------- fused codec programs (single-dispatch) ----------------
    # Same rationale as WACNN.encode_device / decode_*: tunnel dispatch
    # overhead dominates, so base and progressive branches run in ONE program
    # per step; bit-equality with the stepped path is selftest-verified.

    def encode_device_scalable(self, x: jax.Array, q) -> Dict[str, jax.Array]:
        """Fused full encoder for quality level q (static)."""
        y_base = self.split_ga(x)
        y = self.split_ga(y_base, begin=False)
        z = self._seq(self.h_a, y)
        medians = self.entropy_bottleneck.medians()
        z_symbols = quantize_symbols(z, jnp.broadcast_to(medians, z.shape))
        z_hat = z_symbols.astype(jnp.float32) + medians
        latent_means, latent_scales = self._hyper_out(z_hat)

        table = self._scale_table()
        sc = self.slice_ch
        with_prog = q != 0

        out: Dict[str, jax.Array] = {"z_symbols": z_symbols.astype(jnp.int16)}

        if with_prog:
            y_progressive = self._seq(
                self.g_a_progressive, self.concatenate(y_base, x)
            )
            z_prog = self._h_a_prog(y_progressive)
            medians_p = self.entropy_bottleneck_prog.medians()
            zp_symbols = quantize_symbols(
                z_prog, jnp.broadcast_to(medians_p, z_prog.shape)
            )
            z_hat_prog = zp_symbols.astype(jnp.float32) + medians_p
            means_prog, scales_prog = self._hyper_synth_prog(z_hat_prog)
            out["z_prog_symbols"] = zp_symbols.astype(jnp.int16)
            mask = (
                self._coding_mask(latent_scales, scales_prog, q)
                if self.uses_coding_mask
                else None
            )

        y_hat_slices, sym_slices, idx_slices = [], [], []
        yp_hat_slices, psym_slices, pidx_slices = [], [], []
        n_saturated = jnp.zeros((), jnp.int32)

        def _clip8(raw):
            nonlocal n_saturated
            clipped = jnp.clip(raw, -127, 127)
            n_saturated = n_saturated + jnp.sum(
                (raw != clipped).astype(jnp.int32)
            )
            return clipped

        for i in range(self.num_slices):
            y_slice = y[..., i * sc : (i + 1) * sc]
            support = self._support(y_hat_slices)
            mu, scale, mean_support = self._slice_mu_scale(
                i, latent_means, latent_scales, support
            )
            idx_slices.append(gc_build_indexes(scale, table))
            y_q = _clip8(quantize_symbols(y_slice, mu))
            sym_slices.append(y_q)
            y_hat_slice = y_q.astype(jnp.float32) + mu
            y_hat_slice = y_hat_slice + self._lrp(i, mean_support, y_hat_slice)
            y_hat_slices.append(y_hat_slice)

            if with_prog:
                yp_slice = y_progressive[..., i * sc : (i + 1) * sc]
                support_p = self._support(yp_hat_slices)
                mu_p, scale_p, mean_support_p = self._slice_mu_scale_prog(
                    i, means_prog, scales_prog, support_p
                )
                if mask is not None:
                    block_mask = mask[..., i * sc : (i + 1) * sc]
                    pidx_slices.append(
                        gc_build_indexes(scale_p * block_mask, table)
                    )
                    q_p = _clip8(
                        quantize_symbols((yp_slice - mu_p) * block_mask)
                    )
                else:
                    pidx_slices.append(gc_build_indexes(scale_p, table))
                    q_p = _clip8(quantize_symbols(yp_slice, mu_p))
                psym_slices.append(q_p)
                yp_hat = q_p.astype(jnp.float32) + mu_p
                if self.lrp_prog:
                    yp_hat = yp_hat + self._lrp_prog(i, mean_support_p, yp_hat)
                yp_hat_slices.append(yp_hat)

        out["y_symbols"] = jnp.stack(sym_slices, axis=1).astype(jnp.int8)
        out["y_indexes"] = jnp.stack(idx_slices, axis=1).astype(jnp.uint8)
        out["n_saturated"] = n_saturated
        if with_prog:
            out["y_prog_symbols"] = jnp.stack(psym_slices, axis=1).astype(jnp.int8)
            out["y_prog_indexes"] = jnp.stack(pidx_slices, axis=1).astype(jnp.uint8)
            complete = [
                self._merge(a, b, i)
                for i, (a, b) in enumerate(zip(y_hat_slices, yp_hat_slices))
            ]
            out["y_hat"] = self._final_latent(complete, yp_hat_slices, q)
        else:
            out["y_hat"] = jnp.concatenate(y_hat_slices, axis=-1)
        return out

    # ------------- fully-fused on-device-coded programs -------------
    # Scalable analogue of WACNN.encode_coded/decode_coded: the interleaved
    # rANS coder (coding/device_ans.py) runs inside the program, one lane
    # set chaining every plane. Decode plane order (and the encoder's
    # reversed scan order) is:
    #     q == 0:  [z, y_0, ..., y_{ns-1}]
    #     q != 0:  [z, z_prog, y_0, y_prog_0, ..., y_{ns-1}, y_prog_{ns-1}]
    # Row namespace: GC rows [0,64), base-EB rows 64+c, prog-EB rows
    # 64 + C_base + c (build_device_tables(gc, eb, eb_prog)).

    def encode_coded_scalable(
        self,
        x: jax.Array,
        tables,
        q,
        lanes: int = 128,
        cap: int = 0,
        split_tables=None,
        split_consts=None,
        split_capv: int = 0,
        sidecar_cap: int = 512,
        interleave: bool = True,
    ):
        import functools

        from ...coding.device_ans import (
            ans_encode_packed,
            bins_to_values,
            compact_words_dense,
            pack_table_entries,
            split_encode_plane,
            values_to_bins,
        )
        from ...coding.device_ans import lanes_to_plane as _l2p
        from ...coding.device_ans import plane_to_lanes as _p2l

        plane_to_lanes = functools.partial(_p2l, interleave=interleave)
        lanes_to_plane = functools.partial(_l2p, interleave=interleave)

        split = split_tables is not None
        sidecar = sidecar_cap > 0
        delta_planes = [] if sidecar else None
        b = x.shape[0]
        with_prog = q != 0
        table = self._scale_table()
        sc = self.slice_ch

        y_base = self.split_ga(x)
        y = self.split_ga(y_base, begin=False)
        z = self._seq(self.h_a, y)
        medians = self.entropy_bottleneck.medians()
        z_sym = quantize_symbols(z, jnp.broadcast_to(medians, z.shape))
        eb_base = jnp.int32(64)
        z_rows = eb_base + jnp.broadcast_to(
            jnp.arange(z.shape[-1], dtype=jnp.int32), z_sym.shape
        )
        z_bins = values_to_bins(z_sym, z_rows, tables)
        z_vals = bins_to_values(z_bins, z_rows, tables)
        if sidecar:  # decoder patches z back to the true symbols
            delta_planes.append(
                (z_sym.astype(jnp.int32) - z_vals).reshape(b, -1)
            )
            z_vals = z_sym.astype(jnp.int32)
        z_hat = z_vals.astype(jnp.float32) + medians
        latent_means, latent_scales = self._hyper_out(z_hat)

        entry_planes, active_planes = [], []
        n_clamped = jnp.zeros((), jnp.int32)
        n_overflow = jnp.zeros((), jnp.int32)
        n_bad_rows = jnp.zeros((), jnp.int32)

        def add_table_plane(bins_pl, rows_pl):
            e = pack_table_entries(
                plane_to_lanes(bins_pl.reshape(b, -1), lanes),
                plane_to_lanes(rows_pl.reshape(b, -1), lanes),
                tables,
            )
            entry_planes.append(e)
            active_planes.append(jnp.ones_like(e, jnp.bool_))

        def add_y_plane(bins_pl, rows_pl, vals_pl, idx=0):
            """Table-coded (plain) or significance-split y plane; returns
            the (possibly coerced) reconstruction values. idx selects the
            per-plane value cap when split_capv is a tuple (container v4);
            y and y_prog slices of the same index share a budget."""
            nonlocal n_overflow, n_bad_rows
            if not split:
                add_table_plane(bins_pl, rows_pl)
                return vals_pl
            rows_l = plane_to_lanes(rows_pl.reshape(b, -1), lanes)
            bins_l = plane_to_lanes(bins_pl.reshape(b, -1), lanes)
            vals_l = plane_to_lanes(vals_pl.reshape(b, -1), lanes)
            cv = (
                split_capv[idx]
                if isinstance(split_capv, tuple)
                else split_capv
            )
            entries, actives, coerced, n_over, n_bad = split_encode_plane(
                rows_l, bins_l, vals_l, split_tables, split_consts,
                capv=cv,
            )
            entry_planes.extend(entries)
            active_planes.extend(actives)
            n_overflow = n_overflow + n_over
            n_bad_rows = n_bad_rows + n_bad
            return lanes_to_plane(
                coerced, vals_pl.reshape(b, -1).shape[1]
            ).reshape(vals_pl.shape)

        add_table_plane(z_bins, z_rows)

        if with_prog:
            y_progressive = self._seq(
                self.g_a_progressive, self.concatenate(y_base, x)
            )
            z_prog = self._h_a_prog(y_progressive)
            medians_p = self.entropy_bottleneck_prog.medians()
            zp_sym = quantize_symbols(
                z_prog, jnp.broadcast_to(medians_p, z_prog.shape)
            )
            ebp_base = jnp.int32(64 + z.shape[-1])
            zp_rows = ebp_base + jnp.broadcast_to(
                jnp.arange(z_prog.shape[-1], dtype=jnp.int32), zp_sym.shape
            )
            zp_bins = values_to_bins(zp_sym, zp_rows, tables)
            zp_vals = bins_to_values(zp_bins, zp_rows, tables)
            if sidecar:
                delta_planes.append(
                    (zp_sym.astype(jnp.int32) - zp_vals).reshape(b, -1)
                )
                zp_vals = zp_sym.astype(jnp.int32)
            z_hat_prog = zp_vals.astype(jnp.float32) + medians_p
            means_prog, scales_prog = self._hyper_synth_prog(z_hat_prog)
            add_table_plane(zp_bins, zp_rows)
            mask = (
                self._coding_mask(latent_scales, scales_prog, q)
                if self.uses_coding_mask
                else None
            )

        y_hat_slices, yp_hat_slices = [], []
        for i in range(self.num_slices):
            y_slice = y[..., i * sc : (i + 1) * sc]
            support = self._support(y_hat_slices)
            mu, scale, mean_support = self._slice_mu_scale(
                i, latent_means, latent_scales, support
            )
            rows = gc_build_indexes(scale, table)
            raw = quantize_symbols(y_slice, mu)
            bins = values_to_bins(raw, rows, tables, gc_only=True)
            vals = bins_to_values(bins, rows, tables, gc_only=True)
            n_clamped = n_clamped + jnp.sum((raw != vals).astype(jnp.int32))
            vals = add_y_plane(bins, rows, vals, i)
            if sidecar:
                delta_planes.append(
                    (raw.astype(jnp.int32) - vals).reshape(b, -1)
                )
                vals = raw.astype(jnp.int32)
            y_hat_slice = vals.astype(jnp.float32) + mu
            y_hat_slice = y_hat_slice + self._lrp(i, mean_support, y_hat_slice)
            y_hat_slices.append(y_hat_slice)

            if with_prog:
                yp_slice = y_progressive[..., i * sc : (i + 1) * sc]
                support_p = self._support(yp_hat_slices)
                mu_p, scale_p, mean_support_p = self._slice_mu_scale_prog(
                    i, means_prog, scales_prog, support_p
                )
                if mask is not None:
                    block_mask = mask[..., i * sc : (i + 1) * sc]
                    rows_p = gc_build_indexes(scale_p * block_mask, table)
                    raw_p = quantize_symbols((yp_slice - mu_p) * block_mask)
                else:
                    rows_p = gc_build_indexes(scale_p, table)
                    raw_p = quantize_symbols(yp_slice, mu_p)
                bins_p = values_to_bins(raw_p, rows_p, tables, gc_only=True)
                vals_p = bins_to_values(bins_p, rows_p, tables, gc_only=True)
                n_clamped = n_clamped + jnp.sum(
                    (raw_p != vals_p).astype(jnp.int32)
                )
                vals_p = add_y_plane(bins_p, rows_p, vals_p, i)
                if sidecar:
                    delta_planes.append(
                        (raw_p.astype(jnp.int32) - vals_p).reshape(b, -1)
                    )
                    vals_p = raw_p.astype(jnp.int32)
                yp_hat = vals_p.astype(jnp.float32) + mu_p
                if self.lrp_prog:
                    yp_hat = yp_hat + self._lrp_prog(i, mean_support_p, yp_hat)
                yp_hat_slices.append(yp_hat)

        entries_seq = jnp.concatenate(entry_planes, axis=-1)
        active_seq = jnp.concatenate(active_planes, axis=-1)
        states, flags, words = ans_encode_packed(entries_seq, active_seq)
        t_total = entries_seq.shape[-1]
        if cap <= 0:
            cap = max(128, t_total // 16)
        dense, counts = compact_words_dense(flags, words, cap=cap)

        if with_prog:
            complete = [
                self._merge(a, bb, i)
                for i, (a, bb) in enumerate(zip(y_hat_slices, yp_hat_slices))
            ]
            y_hat = self._final_latent(complete, yp_hat_slices, q)
        else:
            y_hat = jnp.concatenate(y_hat_slices, axis=-1)
        out = {
            "words": dense.astype(jnp.uint16),
            "counts": counts,
            "states": states,
            "n_clamped": n_clamped,
            "n_overflow": n_overflow,
            "n_bad_rows": n_bad_rows,
            "y_hat": y_hat,
            "z_shape": jnp.zeros(z.shape[1:3], jnp.int8),  # shape carrier
            "zp_shape": (
                jnp.zeros(z_prog.shape[1:3], jnp.int8) if with_prog else None
            ),
        }
        if sidecar:
            from ...coding.device_ans import collect_outliers

            pos, dval, n_out = collect_outliers(
                jnp.concatenate(delta_planes, axis=-1), sidecar_cap
            )
            out["outlier_pos"] = pos
            out["outlier_delta"] = dval
            out["n_outliers"] = n_out
        return out

    def decode_coded_scalable(
        self,
        words: jax.Array,
        counts: jax.Array,
        states: jax.Array,
        tables,
        z_shape: Tuple[int, int, int, int],
        zp_shape,
        q,
        lanes: int = 128,
        cap: int = 128,  # static >= counts.max(); driver buckets it
        split_tables=None,
        split_consts=None,
        split_capv: int = 0,
        outlier_pos=None,  # (B, K) int32 sidecar positions (pad = out of range)
        outlier_delta=None,  # (B, K) int32 sidecar value deltas
        interleave: bool = True,  # lane layout; must match the encoder's
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        import functools

        from ...coding.device_ans import (
            ans_decode_init,
            ans_decode_plane,
            bins_to_values,
            scatter_outliers,
            split_decode_plane,
        )
        from ...coding.device_ans import lanes_to_plane as _l2p
        from ...coding.device_ans import plane_to_lanes as _p2l

        plane_to_lanes = functools.partial(_p2l, interleave=interleave)
        lanes_to_plane = functools.partial(_l2p, interleave=interleave)

        split = split_tables is not None
        with_prog = q != 0
        b, zh, zw, zc = z_shape
        medians = self.entropy_bottleneck.medians()
        carry = ans_decode_init(states, counts, words, cap)

        # lossless sidecar: dense delta tensor over the concatenated plane
        # sequence (same order as the encoder's delta_planes), patched onto
        # each decoded plane before any downstream use
        sc = self.slice_ch
        n_y = (zh * 4) * (zw * 4) * sc
        n_tot = zh * zw * zc + self.num_slices * n_y
        if with_prog:
            _, zph, zpw, zpc = zp_shape
            n_tot += zph * zpw * zpc + self.num_slices * n_y
        delta_dense = None
        delta_off = [0]  # running offset (mutated by take_delta)
        if outlier_pos is not None and outlier_pos.shape[1] > 0:
            delta_dense = scatter_outliers(outlier_pos, outlier_delta, n_tot)

        def take_delta(vals):
            if delta_dense is None:
                return vals
            n = int(np.prod(vals.shape[1:]))
            seg = delta_dense[:, delta_off[0] : delta_off[0] + n]
            delta_off[0] += n
            return vals + seg.reshape(vals.shape)

        def dec_plane(carry, rows, gc=False):
            shp = rows.shape
            rows_l = plane_to_lanes(rows.reshape(b, -1), lanes)
            carry, bins_l = ans_decode_plane(carry, rows_l, tables)
            bins = lanes_to_plane(bins_l, int(np.prod(shp[1:]))).reshape(shp)
            return carry, take_delta(
                bins_to_values(bins, rows, tables, gc_only=gc)
            )

        def dec_y_plane(carry, rows, idx=0):
            if not split:
                return dec_plane(carry, rows, gc=True)
            shp = rows.shape
            rows_l = plane_to_lanes(rows.reshape(b, -1), lanes)
            cv = (
                split_capv[idx]
                if isinstance(split_capv, tuple)
                else split_capv
            )
            carry, vals_l = split_decode_plane(
                carry, rows_l, split_tables, split_consts, capv=cv
            )
            vals = lanes_to_plane(vals_l, int(np.prod(shp[1:]))).reshape(shp)
            return carry, take_delta(vals)

        eb_base = jnp.int32(64)
        z_rows = eb_base + jnp.broadcast_to(
            jnp.arange(zc, dtype=jnp.int32), (b, zh, zw, zc)
        )
        carry, z_vals = dec_plane(carry, z_rows)
        z_hat = z_vals.astype(jnp.float32) + medians
        latent_means, latent_scales = self._hyper_out(z_hat)

        if with_prog:
            _, zph, zpw, zpc = zp_shape
            medians_p = self.entropy_bottleneck_prog.medians()
            ebp_base = jnp.int32(64 + zc)
            zp_rows = ebp_base + jnp.broadcast_to(
                jnp.arange(zpc, dtype=jnp.int32), (b, zph, zpw, zpc)
            )
            carry, zp_vals = dec_plane(carry, zp_rows)
            z_hat_prog = zp_vals.astype(jnp.float32) + medians_p
            means_prog, scales_prog = self._hyper_synth_prog(z_hat_prog)
            mask = (
                self._coding_mask(latent_scales, scales_prog, q)
                if self.uses_coding_mask
                else None
            )

        table = self._scale_table()
        sc = self.slice_ch
        y_hat_slices, yp_hat_slices = [], []
        for i in range(self.num_slices):
            support = self._support(y_hat_slices)
            mu, scale, mean_support = self._slice_mu_scale(
                i, latent_means, latent_scales, support
            )
            rows = gc_build_indexes(scale, table)
            carry, vals = dec_y_plane(carry, rows, i)
            y_hat_slice = vals.astype(jnp.float32) + mu
            y_hat_slice = y_hat_slice + self._lrp(i, mean_support, y_hat_slice)
            y_hat_slices.append(y_hat_slice)

            if with_prog:
                support_p = self._support(yp_hat_slices)
                mu_p, scale_p, mean_support_p = self._slice_mu_scale_prog(
                    i, means_prog, scales_prog, support_p
                )
                if mask is not None:
                    block_mask = mask[..., i * sc : (i + 1) * sc]
                    rows_p = gc_build_indexes(scale_p * block_mask, table)
                else:
                    rows_p = gc_build_indexes(scale_p, table)
                carry, vals_p = dec_y_plane(carry, rows_p, i)
                yp_hat = vals_p.astype(jnp.float32) + mu_p
                if self.lrp_prog:
                    yp_hat = yp_hat + self._lrp_prog(i, mean_support_p, yp_hat)
                yp_hat_slices.append(yp_hat)

        if with_prog:
            complete = [
                self._merge(a, bb, j)
                for j, (a, bb) in enumerate(zip(y_hat_slices, yp_hat_slices))
            ]
            y_hat = self._final_latent(complete, yp_hat_slices, q)
        else:
            y_hat = jnp.concatenate(y_hat_slices, axis=-1)
        x_hat = jnp.clip(
            self._synthesize_q(y_hat, 0 if q == 0 else 1), 0.0, 1.0
        )
        # drained-stream invariant (checked by the codec driver): every
        # lane's state must return to the encoder's initial state and every
        # stored word must have been consumed — any ulp divergence between
        # the encode/decode compilations desyncs the stream and trips this.
        drained = jnp.logical_and(
            jnp.all(carry.states == jnp.uint32(1 << 16)),
            jnp.all(carry.ptrs == counts),
        )
        return x_hat, y_hat, drained

    def decode_begin_scalable(self, z_hat, z_hat_prog, q):
        """Fused: both hyper syntheses + mask + slice-0 params (both
        branches)."""
        latent_means, latent_scales = self._hyper_out(z_hat)
        mu0, scale0, _ = self._slice_mu_scale(0, latent_means, latent_scales, [])
        idx0 = gc_build_indexes(scale0, self._scale_table()).astype(jnp.uint8)

        means_prog, scales_prog = self._hyper_synth_prog(z_hat_prog)
        mask = (
            self._coding_mask(latent_scales, scales_prog, q)
            if self.uses_coding_mask
            else None
        )
        sc = self.slice_ch
        mu0p, scale0p, _ = self._slice_mu_scale_prog(
            0, means_prog, scales_prog, []
        )
        if mask is not None:
            scale0p = scale0p * mask[..., :sc]
        idx0p = gc_build_indexes(scale0p, self._scale_table()).astype(jnp.uint8)
        return (
            latent_means, latent_scales, mu0, idx0,
            means_prog, scales_prog, mu0p, idx0p, mask,
        )

    def decode_step_scalable(
        self, slice_index: int,
        symbols_prev, mu_prev, symbols_prev_prog, mu_prev_prog,
        latent_means, latent_scales, means_prog, scales_prog,
        support, support_prog, mask,
    ):
        """Fused: reconstruct both branches' slice i-1 + params for slice i."""
        i_prev = slice_index - 1
        sc = self.slice_ch

        y_hat_prev = symbols_prev.astype(jnp.float32) + mu_prev
        ms_prev = self._lrp_mean_support(i_prev, latent_means, support)
        y_hat_prev = y_hat_prev + self._lrp(i_prev, ms_prev, y_hat_prev)

        yp_hat_prev = symbols_prev_prog.astype(jnp.float32) + mu_prev_prog
        if self.lrp_prog:
            msp_prev = jnp.concatenate(
                [means_prog] + list(support_prog), axis=-1
            )
            yp_hat_prev = yp_hat_prev + self._lrp_prog(
                i_prev, msp_prev, yp_hat_prev
            )

        new_support = (list(support) + [y_hat_prev])[: self.max_support_slices]
        mu, scale, _ = self._slice_mu_scale(
            slice_index, latent_means, latent_scales, new_support
        )
        idx = gc_build_indexes(scale, self._scale_table()).astype(jnp.uint8)

        new_support_p = (list(support_prog) + [yp_hat_prev])[
            : self.max_support_slices
        ]
        mu_p, scale_p, _ = self._slice_mu_scale_prog(
            slice_index, means_prog, scales_prog, new_support_p
        )
        if mask is not None:
            scale_p = scale_p * mask[
                ..., slice_index * sc : (slice_index + 1) * sc
            ]
        idx_p = gc_build_indexes(scale_p, self._scale_table()).astype(jnp.uint8)
        return y_hat_prev, yp_hat_prev, mu, idx, mu_p, idx_p

    def decode_end_scalable(
        self, symbols, mu, symbols_prog, mu_prog,
        latent_means, means_prog, slices, slices_prog, q,
    ):
        """Fused: final-slice reconstructions + merge + final latent + g_s."""
        i = self.num_slices - 1
        y_hat_last = symbols.astype(jnp.float32) + mu
        ms = self._lrp_mean_support(
            i, latent_means, list(slices)[: self.max_support_slices]
        )
        y_hat_last = y_hat_last + self._lrp(i, ms, y_hat_last)

        yp_hat_last = symbols_prog.astype(jnp.float32) + mu_prog
        if self.lrp_prog:
            msp = jnp.concatenate(
                [means_prog] + list(slices_prog)[: self.max_support_slices],
                axis=-1,
            )
            yp_hat_last = yp_hat_last + self._lrp_prog(i, msp, yp_hat_last)

        base = list(slices) + [y_hat_last]
        prog = list(slices_prog) + [yp_hat_last]
        complete = [self._merge(a, b, j) for j, (a, b) in enumerate(zip(base, prog))]
        y_hat = self._final_latent(complete, prog, q)
        return jnp.clip(self._synthesize_q(y_hat, q), 0.0, 1.0), y_hat
