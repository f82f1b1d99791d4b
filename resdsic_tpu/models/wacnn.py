"""WACNN baseline codec ("cnn" registry key).

Parity target: src/compress/models/WACNN/cnn.py (class WACNN, 346 LoC):
N=192, M=320, 10 channel slices of 32 with ≤5 support slices, GDN analysis/
synthesis with shifted-window attention, conv hyperprior, per-slice
channel-autoregressive gaussian conditional with latent residual prediction.

TPU-first structure:
  * __call__ is one pure jit-traceable function (the 10-slice loop is a
    static Python loop over heterogeneous per-slice conv stacks — unrolled
    at trace time, fully fused by XLA).
  * compress_device() computes EVERYTHING the encoder needs — z symbols,
    y symbols, scale indexes — in a single device program with zero host
    round-trips; `round(y-mu)+mu` is decoder-consistent so the autoregressive
    support slices never need real decoded values on the encoder.
  * decode side exposes per-slice methods (slice_params / slice_reconstruct)
    that the host codec driver interleaves with native rANS decode calls —
    the only fundamentally sequential host↔device boundary (SURVEY.md §7).

All tensors are NHWC (TPU-native). Hidden widths are derived from (N, M) so
tiny test configs exist; defaults reproduce the reference exactly.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..entropy import (
    EntropyBottleneck,
    GaussianConditional,
    gc_build_indexes,
    get_scale_table,
    quantize_symbols,
)
from ..nn import (
    GDN,
    Conv,
    Deconv,
    SubpelConv3x3,
    WinNoShiftAttention,
    gelu,
)
from ..ops.math import ste_round


def _hyper_widths(M: int, N: int) -> list:
    """h_a channel chain M→N in 5 stops (ref cnn.py:56-66: 320,288,256,224,192)."""
    return [int(round(v)) for v in np.linspace(M, N, 5)]


def _cc_widths(M: int) -> list:
    """cc-transform hidden widths (ref cnn.py:91-116: 224,176,128,64 @ M=320)."""
    return [int(M * f) for f in (0.7, 0.55, 0.4, 0.2)]


class WACNN(nn.Module):
    """CNN-based codec with channel-wise autoregressive entropy model."""

    N: int = 192
    M: int = 320
    num_slices: int = 10
    max_support_slices: int = 5
    dtype: Any = jnp.float32

    @property
    def slice_ch(self) -> int:
        return self.M // self.num_slices

    def setup(self):
        N, M, dt = self.N, self.M, self.dtype

        self.g_a = [
            Conv(N, kernel_size=5, stride=2, dtype=dt),
            GDN(dtype=dt),
            Conv(N, kernel_size=5, stride=2, dtype=dt),
            GDN(dtype=dt),
            WinNoShiftAttention(dim=N, num_heads=8, window_size=8, shift_size=4, dtype=dt),
            Conv(N, kernel_size=5, stride=2, dtype=dt),
            GDN(dtype=dt),
            Conv(M, kernel_size=5, stride=2, dtype=dt),
            WinNoShiftAttention(dim=M, num_heads=8, window_size=4, shift_size=2, dtype=dt),
        ]
        self.g_s = [
            WinNoShiftAttention(dim=M, num_heads=8, window_size=4, shift_size=2, dtype=dt),
            Deconv(N, kernel_size=5, stride=2, dtype=dt),
            GDN(inverse=True, dtype=dt),
            Deconv(N, kernel_size=5, stride=2, dtype=dt),
            GDN(inverse=True, dtype=dt),
            WinNoShiftAttention(dim=N, num_heads=8, window_size=8, shift_size=4, dtype=dt),
            Deconv(N, kernel_size=5, stride=2, dtype=dt),
            GDN(inverse=True, dtype=dt),
            Deconv(3, kernel_size=5, stride=2, dtype=dt),
        ]

        hw = _hyper_widths(M, N)  # [M, ., ., ., N]
        self.h_a = [
            Conv(hw[0], kernel_size=3, stride=1, dtype=dt), gelu,
            Conv(hw[1], kernel_size=3, stride=1, dtype=dt), gelu,
            Conv(hw[2], kernel_size=3, stride=2, dtype=dt), gelu,
            Conv(hw[3], kernel_size=3, stride=1, dtype=dt), gelu,
            Conv(hw[4], kernel_size=3, stride=2, dtype=dt),
        ]
        hyper_up = [
            Conv(hw[4], kernel_size=3, stride=1, dtype=dt), gelu,
            SubpelConv3x3(hw[3], r=2, dtype=dt), gelu,
            Conv(hw[2], kernel_size=3, stride=1, dtype=dt), gelu,
            SubpelConv3x3(hw[1], r=2, dtype=dt), gelu,
            Conv(hw[0], kernel_size=3, stride=1, dtype=dt),
        ]
        self.h_mean_s = hyper_up
        self.h_scale_s = [
            Conv(hw[4], kernel_size=3, stride=1, dtype=dt), gelu,
            SubpelConv3x3(hw[3], r=2, dtype=dt), gelu,
            Conv(hw[2], kernel_size=3, stride=1, dtype=dt), gelu,
            SubpelConv3x3(hw[1], r=2, dtype=dt), gelu,
            Conv(hw[0], kernel_size=3, stride=1, dtype=dt),
        ]

        cw = _cc_widths(M)
        sc = self.slice_ch

        def cc_stack():
            return [
                Conv(cw[0], kernel_size=3, stride=1, dtype=dt), gelu,
                Conv(cw[1], kernel_size=3, stride=1, dtype=dt), gelu,
                Conv(cw[2], kernel_size=3, stride=1, dtype=dt), gelu,
                Conv(cw[3], kernel_size=3, stride=1, dtype=dt), gelu,
                Conv(sc, kernel_size=3, stride=1, dtype=dt),
            ]

        self.cc_mean_transforms = [cc_stack() for _ in range(self.num_slices)]
        self.cc_scale_transforms = [cc_stack() for _ in range(self.num_slices)]
        self.lrp_transforms = [cc_stack() for _ in range(self.num_slices)]

        self.entropy_bottleneck = EntropyBottleneck(channels=self.N)
        self.gaussian_conditional = GaussianConditional()

    # ---------------- pure helpers ----------------

    @staticmethod
    def _seq(layers, x):
        for layer in layers:
            x = layer(x)
        return x

    def _scale_table(self) -> jax.Array:
        return jnp.asarray(get_scale_table())

    def _support(self, y_hat_slices: Sequence[jax.Array]):
        if self.max_support_slices < 0:
            return list(y_hat_slices)
        return list(y_hat_slices[: self.max_support_slices])

    # ---- deterministic-compilation islands -------------------------------
    #
    # The enc/dec bit-identity contract requires the decoder-side
    # prediction quantities (hyper outputs, per-slice mu/scale, LRP) to
    # be BIT-IDENTICAL across separately compiled programs (fused
    # encoder, stepped decoder, coded enc/dec). XLA guarantees value
    # determinism only within one compilation; a different fusion context
    # can change f32 accumulation order — observed in round 3: a trained
    # f32 WACNN desynced the rANS stream on TPU (selftest caught it).
    # optimization_barrier fences turn each shared subgraph into an
    # isolated HLO island that is byte-identical in every program, which
    # the deterministic compiler lowers identically. Runtime guards:
    # selftest()/selftest_coded() and the coded decoder's drained-stream
    # check.

    @staticmethod
    def _iso(tree):
        return jax.lax.optimization_barrier(tree)

    def _hyper_out(self, z_hat):
        """Barriered (latent_means, latent_scales) island."""
        z_hat = self._iso(z_hat)
        lm = self._seq(self.h_mean_s, z_hat)
        ls = self._seq(self.h_scale_s, z_hat)
        return self._iso((lm, ls))

    def _slice_mu_scale(self, idx, latent_means, latent_scales, support):
        latent_means, latent_scales, support = self._iso(
            (latent_means, latent_scales, list(support))
        )
        mean_support = jnp.concatenate([latent_means] + support, axis=-1)
        mu = self._seq(self.cc_mean_transforms[idx], mean_support)
        scale_support = jnp.concatenate([latent_scales] + support, axis=-1)
        scale = self._seq(self.cc_scale_transforms[idx], scale_support)
        mu, scale = self._iso((mu, scale))
        return mu, scale, mean_support

    def _lrp(self, idx, mean_support, y_hat_slice):
        mean_support, y_hat_slice = self._iso((mean_support, y_hat_slice))
        lrp_support = jnp.concatenate([mean_support, y_hat_slice], axis=-1)
        lrp = self._seq(self.lrp_transforms[idx], lrp_support)
        return self._iso(0.5 * jnp.tanh(lrp))

    def _lrp_mean_support(self, idx, latent_means, support):
        """Mean support for decode-side LRP; must equal what
        _slice_mu_scale hands to _lrp on the encode side (TCM overrides
        with its SWAtten-attended version)."""
        return jnp.concatenate([latent_means] + list(support), axis=-1)

    @property
    def hyper_channels(self) -> int:
        return getattr(self, "hyper_ch", None) or self.N

    # ---------------- training / estimation forward ----------------

    def __call__(self, x: jax.Array, training: bool = False) -> Dict[str, Any]:
        y = self._seq(self.g_a, x)
        z = self._seq(self.h_a, y)

        _, z_likelihoods = self.entropy_bottleneck(z, training=training)

        # STE-round z around medians for the synthesis path (ref cnn.py:152-154)
        medians = self.entropy_bottleneck.medians()
        z_hat = ste_round(z - medians) + medians

        latent_means, latent_scales = self._hyper_out(z_hat)

        sc = self.slice_ch
        y_hat_slices = []
        y_likelihoods = []
        for i in range(self.num_slices):
            y_slice = y[..., i * sc : (i + 1) * sc]
            support = self._support(y_hat_slices)
            mu, scale, mean_support = self._slice_mu_scale(
                i, latent_means, latent_scales, support
            )
            _, lik = self.gaussian_conditional(
                y_slice, scale, mu, training=training
            )
            y_likelihoods.append(lik)

            y_hat_slice = ste_round(y_slice - mu) + mu
            y_hat_slice = y_hat_slice + self._lrp(i, mean_support, y_hat_slice)
            y_hat_slices.append(y_hat_slice)

        y_hat = jnp.concatenate(y_hat_slices, axis=-1)
        x_hat = self._seq(self.g_s, y_hat)

        return {
            "x_hat": x_hat,
            "likelihoods": {
                "y": jnp.concatenate(y_likelihoods, axis=-1),
                "z": z_likelihoods,
            },
        }

    def aux_loss(self) -> jax.Array:
        return self.entropy_bottleneck.aux_loss()

    # ---------------- encoder device programs ----------------
    #
    # Codec-determinism rule: any quantity the DECODER recomputes (z_hat,
    # latent means/scales, per-slice mu/scale/indexes, reconstructed slices)
    # must be produced by the SAME jitted executable on both sides — two
    # differently-fused XLA programs can disagree by 1 ulp, which flips a
    # round()/searchsorted decision and desyncs the rANS stream. analyze()
    # therefore only computes encoder-private values (y, z symbols); the
    # shared hyper_synthesis/slice_params/slice_reconstruct programs are
    # driven identically by the host codec for encode and decode.

    def analyze(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """g_a + h_a + z quantization. Returns (y, z_symbols)."""
        y = self._seq(self.g_a, x)
        z = self._seq(self.h_a, y)
        medians = self.entropy_bottleneck.medians()
        z_symbols = quantize_symbols(z, jnp.broadcast_to(medians, z.shape))
        return y, z_symbols

    def quantize_slice(
        self, slice_index: int, y: jax.Array, mu: jax.Array
    ) -> jax.Array:
        """Integer symbols for one y slice given the shared-program mu
        (int8-range clamp, matching encode_device)."""
        sc = self.slice_ch
        y_slice = y[..., slice_index * sc : (slice_index + 1) * sc]
        return jnp.clip(quantize_symbols(y_slice, mu), -127, 127)

    def encode_device(self, x: jax.Array) -> Dict[str, jax.Array]:
        """FUSED full-encoder program: one dispatch, zero host round-trips.

        Empirically bit-identical on TPU to the stepped decoder programs
        (verified by WACNNCodec.selftest); the tunnel dispatch overhead makes
        this ~10x cheaper than per-slice calls. Symbol stacks come back
        slice-major (B, num_slices, h, w, slice_ch).
        """
        y = self._seq(self.g_a, x)
        z = self._seq(self.h_a, y)
        medians = self.entropy_bottleneck.medians()
        z_symbols = quantize_symbols(z, jnp.broadcast_to(medians, z.shape))
        z_hat = z_symbols.astype(jnp.float32) + medians

        latent_means, latent_scales = self._hyper_out(z_hat)

        table = self._scale_table()
        sc = self.slice_ch
        y_hat_slices, sym_slices, idx_slices = [], [], []
        n_saturated = jnp.zeros((), jnp.int32)
        for i in range(self.num_slices):
            y_slice = y[..., i * sc : (i + 1) * sc]
            support = self._support(y_hat_slices)
            mu, scale, mean_support = self._slice_mu_scale(
                i, latent_means, latent_scales, support
            )
            idx_slices.append(gc_build_indexes(scale, table))
            # int8-range clamp BEFORE reconstruction: y residuals are tiny in
            # trained models; clamping here keeps encoder/decoder consistent
            # and quarters the dominant d2h transfer. Saturated residuals are
            # reconstructed wrong (the reference bypass-codes them lossless),
            # so the count is surfaced and the codec warns when nonzero.
            raw = quantize_symbols(y_slice, mu)
            y_q = jnp.clip(raw, -127, 127)
            n_saturated = n_saturated + jnp.sum((raw != y_q).astype(jnp.int32))
            sym_slices.append(y_q)
            y_hat_slice = y_q.astype(jnp.float32) + mu
            y_hat_slice = y_hat_slice + self._lrp(i, mean_support, y_hat_slice)
            y_hat_slices.append(y_hat_slice)

        # narrow dtypes: d2h transfer dominates on tunneled TPUs
        return {
            "z_symbols": z_symbols.astype(jnp.int16),
            "y_symbols": jnp.stack(sym_slices, axis=1).astype(jnp.int8),
            "y_indexes": jnp.stack(idx_slices, axis=1).astype(jnp.uint8),
            "y_hat": jnp.concatenate(y_hat_slices, axis=-1),
            "n_saturated": n_saturated,
        }

    # ---------------- fully-fused on-device-coded programs ----------------
    #
    # These push the entropy coder itself into the XLA program
    # (coding/device_ans.py): the bitstream is produced/consumed on device,
    # so compress is ONE dispatch emitting actual compressed words and
    # decompress is ONE dispatch consuming them — the channel-autoregressive
    # slice loop never leaves the chip. Replaces the reference's host
    # decode loop (cnn.py:260-342) with a TPU-resident equivalent.

    def encode_coded(
        self,
        x: jax.Array,
        tables,
        lanes: int = 128,
        cap: int = 0,
        split_tables=None,
        split_consts=None,
        split_capv: int = 0,
        sidecar_cap: int = 512,
        interleave: bool = True,
    ):
        """Full encoder + on-device rANS. Returns dense words + header.

        interleave selects the lane layout (device_ans.plane_to_lanes):
        strided (container v3, default) spreads spatial bursts across
        lanes so per-lane counts concentrate; False keeps the legacy
        contiguous layout of v1/v2 containers.

        Decode plane order is [z, y_slice_0, ..., y_slice_{ns-1}]; the
        encoder scans that sequence reversed so one lane set chains all
        planes (no per-plane flush overhead). Words come back as a
        (B*lanes, cap) dense per-lane matrix (compact_words_dense);
        `cap` <= 0 means T/8 — the driver re-dispatches with a larger cap
        if any lane overflows (counts are exact either way).

        With split_tables/split_consts (significance-split mode) each y
        slice codes as [binary significance plane, dense nonzero-value
        plane]: the zero/nonzero decision is pure-ALU rANS, and only the
        sparse nonzero residuals pay the table-gather throughput floor.

        Lossless outlier sidecar (sidecar_cap > 0, the default): every
        element whose in-stream decodable value differs from the true
        quantized symbol — CDF-support clamps AND split-cap coercions —
        is emitted as a (flat position, delta) pair (device_ans.
        collect_outliers), the per-image reconstruction uses the TRUE
        values, and decode_coded patches the decoded planes before any
        downstream use. The coded roundtrip is then bit-exact lossless
        (the reference achieves the same via escape/bypass coding,
        SURVEY §2.7); only a per-image outlier count above sidecar_cap
        (checked by the driver via n_outliers) forces the host-coder
        fallback. sidecar_cap=0 restores the round-2 clamp-on-both-sides
        behavior.

        Loss counters (all zero at trained-model statistics):
          n_clamped:  symbols clamped to the row's CDF support
          n_overflow: split-mode nonzeros coerced past the per-lane cap
          n_bad_rows: split-plane rows outside the const domain
                      (internal invariant violation — must stay 0)
        """
        import functools

        from ..coding.device_ans import (
            ans_encode_packed,
            bins_to_values,
            compact_words_dense,
            pack_table_entries,
            values_to_bins,
        )
        from ..coding.device_ans import lanes_to_plane as _l2p
        from ..coding.device_ans import plane_to_lanes as _p2l

        plane_to_lanes = functools.partial(_p2l, interleave=interleave)
        lanes_to_plane = functools.partial(_l2p, interleave=interleave)

        split = split_tables is not None
        sidecar = sidecar_cap > 0

        y = self._seq(self.g_a, x)
        z = self._seq(self.h_a, y)
        medians = self.entropy_bottleneck.medians()
        z_sym = quantize_symbols(z, jnp.broadcast_to(medians, z.shape))

        b = x.shape[0]
        eb_base = jnp.int32(64)  # GC rows [0,64), EB rows at 64+channel
        z_rows = eb_base + jnp.broadcast_to(
            jnp.arange(z.shape[-1], dtype=jnp.int32), z_sym.shape
        )
        z_bins = values_to_bins(z_sym, z_rows, tables)
        z_vals = bins_to_values(z_bins, z_rows, tables)
        # with a sidecar the decoder patches z back to the true symbols, so
        # the encoder's z_hat must use them too
        z_used = z_sym.astype(jnp.int32) if sidecar else z_vals
        delta_planes = [
            (z_sym.astype(jnp.int32) - z_vals).reshape(b, -1)
        ] if sidecar else None
        z_hat = z_used.astype(jnp.float32) + medians

        latent_means, latent_scales = self._hyper_out(z_hat)

        table = self._scale_table()
        sc = self.slice_ch
        y_hat_slices = []
        # NOTE: lane-layout BEFORE packing — plane_to_lanes zero-pads, and
        # bins=0/rows=0 is a valid (freq>=1) entry while a zero-padded
        # PACKED entry would mean freq=0 and desync the stream
        entry_planes = [
            pack_table_entries(
                plane_to_lanes(z_bins.reshape(b, -1), lanes),
                plane_to_lanes(z_rows.reshape(b, -1), lanes),
                tables,
            )
        ]
        active_planes = [jnp.ones_like(entry_planes[0], jnp.bool_)]
        n_clamped = jnp.zeros((), jnp.int32)
        n_overflow = jnp.zeros((), jnp.int32)
        n_bad_rows = jnp.zeros((), jnp.int32)
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

            if not split:
                entry_planes.append(
                    pack_table_entries(
                        plane_to_lanes(bins.reshape(b, -1), lanes),
                        plane_to_lanes(rows.reshape(b, -1), lanes),
                        tables,
                    )
                )
                active_planes.append(
                    jnp.ones_like(entry_planes[-1], jnp.bool_)
                )
            else:
                from ..coding.device_ans import split_encode_plane

                rows_l = plane_to_lanes(rows.reshape(b, -1), lanes)
                bins_l = plane_to_lanes(bins.reshape(b, -1), lanes)
                vals_l = plane_to_lanes(vals.reshape(b, -1), lanes)
                # per-plane value cap (container v4): a tuple carries one
                # budget per slice, sized from that slice's own
                # significance rate — one dense slice no longer inflates
                # every plane's value scan
                cv = (
                    split_capv[i]
                    if isinstance(split_capv, tuple)
                    else split_capv
                )
                entries, actives, vals_coerced, n_over, n_bad = (
                    split_encode_plane(
                        rows_l, bins_l, vals_l, split_tables, split_consts,
                        capv=cv,
                    )
                )
                entry_planes.extend(entries)
                active_planes.extend(actives)
                n_overflow = n_overflow + n_over
                n_bad_rows = n_bad_rows + n_bad
                # reconstruction uses the coerced (kept-only) values
                vals = lanes_to_plane(
                    vals_coerced, vals.reshape(b, -1).shape[1]
                ).reshape(vals.shape)

            if sidecar:
                delta_planes.append(
                    (raw.astype(jnp.int32) - vals).reshape(b, -1)
                )
                vals = raw.astype(jnp.int32)
            y_hat_slice = vals.astype(jnp.float32) + mu
            y_hat_slice = y_hat_slice + self._lrp(i, mean_support, y_hat_slice)
            y_hat_slices.append(y_hat_slice)

        entries_seq = jnp.concatenate(entry_planes, axis=-1)
        active_seq = jnp.concatenate(active_planes, axis=-1)
        states, flags, words = ans_encode_packed(entries_seq, active_seq)
        t_total = entries_seq.shape[-1]
        if cap <= 0:
            cap = max(128, t_total // 16)
        dense, counts = compact_words_dense(flags, words, cap=cap)
        out = {
            "words": dense.astype(jnp.uint16),  # (B*lanes, cap) per-lane rows
            "counts": counts,  # (B, lanes) int32
            "states": states,  # (B, lanes) uint32
            "n_clamped": n_clamped,
            "n_overflow": n_overflow,
            "n_bad_rows": n_bad_rows,
            "y_hat": jnp.concatenate(y_hat_slices, axis=-1),
        }
        if sidecar:
            from ..coding.device_ans import collect_outliers

            pos, dval, n_out = collect_outliers(
                jnp.concatenate(delta_planes, axis=-1), sidecar_cap
            )
            out["outlier_pos"] = pos
            out["outlier_delta"] = dval
            out["n_outliers"] = n_out
        return out

    def decode_coded(
        self,
        words: jax.Array,  # (N,) flat uint16 words (padded ok)
        counts: jax.Array,  # (B, lanes) int32
        states: jax.Array,  # (B, lanes) uint32
        tables,
        z_shape: Tuple[int, int, int, int],
        lanes: int = 128,
        cap: int = 128,  # static >= counts.max(); driver buckets it
        split_tables=None,
        split_consts=None,
        split_capv: int = 0,
        outlier_pos=None,  # (B, K) int32 sidecar positions (pad = n_tot)
        outlier_delta=None,  # (B, K) int32 sidecar value deltas
        interleave: bool = True,  # lane layout; must match the encoder's
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Single-dispatch full decode: device rANS + slice loop + g_s.

        Determinism note: this program recomputes latent means/scales and
        per-slice mu/scale/rows from z_hat — the same subgraphs the encoder
        fused into encode_coded. The parameter path runs on deterministic
        Pallas conv kernels (ops/pallas_conv.py) so the two compilations
        agree bit-for-bit; WACNNCodec.selftest_coded asserts it and the
        drained-stream check guards every production decode.

        outlier_pos/outlier_delta (the blob's lossless sidecar, see
        encode_coded) are scattered onto the decoded planes BEFORE any
        downstream use, mirroring the encoder's true-value reconstruction.
        """
        import functools

        from ..coding.device_ans import (
            ans_decode_init,
            ans_decode_plane,
            bins_to_values,
            scatter_outliers,
        )
        from ..coding.device_ans import lanes_to_plane as _l2p
        from ..coding.device_ans import plane_to_lanes as _p2l

        plane_to_lanes = functools.partial(_p2l, interleave=interleave)
        lanes_to_plane = functools.partial(_l2p, interleave=interleave)

        split = split_tables is not None
        b, zh, zw, zc = z_shape
        medians = self.entropy_bottleneck.medians()

        n_z = zh * zw * zc
        sc = self.slice_ch
        n_y = (zh * 4) * (zw * 4) * sc
        delta_dense = None
        if outlier_pos is not None and outlier_pos.shape[1] > 0:
            delta_dense = scatter_outliers(
                outlier_pos, outlier_delta, n_z + self.num_slices * n_y
            )

        carry = ans_decode_init(states, counts, words, cap)

        eb_base = jnp.int32(64)
        z_rows = eb_base + jnp.broadcast_to(
            jnp.arange(zc, dtype=jnp.int32), (b, zh, zw, zc)
        )
        z_rows_l = plane_to_lanes(z_rows.reshape(b, -1), lanes)
        carry, z_bins_l = ans_decode_plane(carry, z_rows_l, tables)
        z_bins = lanes_to_plane(z_bins_l, zh * zw * zc).reshape(b, zh, zw, zc)
        z_vals = bins_to_values(z_bins, z_rows, tables)
        if delta_dense is not None:
            z_vals = z_vals + delta_dense[:, :n_z].reshape(z_vals.shape)
        z_hat = z_vals.astype(jnp.float32) + medians

        latent_means, latent_scales = self._hyper_out(z_hat)

        table = self._scale_table()
        yh, yw = zh * 4, zw * 4
        y_hat_slices = []
        for i in range(self.num_slices):
            support = self._support(y_hat_slices)
            mu, scale, mean_support = self._slice_mu_scale(
                i, latent_means, latent_scales, support
            )
            rows = gc_build_indexes(scale, table)
            rows_l = plane_to_lanes(rows.reshape(b, -1), lanes)
            if not split:
                carry, bins_l = ans_decode_plane(carry, rows_l, tables)
                bins = lanes_to_plane(bins_l, n_y).reshape(b, yh, yw, sc)
                vals = bins_to_values(bins, rows, tables, gc_only=True)
            else:
                from ..coding.device_ans import split_decode_plane

                carry, vals_l = split_decode_plane(
                    carry, rows_l, split_tables, split_consts,
                    capv=(
                        split_capv[i]
                        if isinstance(split_capv, tuple)
                        else split_capv
                    ),
                )
                vals = lanes_to_plane(vals_l, n_y).reshape(b, yh, yw, sc)
            if delta_dense is not None:
                off = n_z + i * n_y
                vals = vals + delta_dense[:, off : off + n_y].reshape(
                    vals.shape
                )
            y_hat_slice = vals.astype(jnp.float32) + mu
            y_hat_slice = y_hat_slice + self._lrp(i, mean_support, y_hat_slice)
            y_hat_slices.append(y_hat_slice)

        y_hat = jnp.concatenate(y_hat_slices, axis=-1)
        # drained-stream invariant (checked by the codec driver): lane
        # states must return to the encoder's init and every stored word
        # must be consumed — a desynced stream (ulp divergence between the
        # encode/decode compilations, corrupt blob, wrong config) trips it.
        drained = jnp.logical_and(
            jnp.all(carry.states == jnp.uint32(1 << 16)),
            jnp.all(carry.ptrs == counts),
        )
        return jnp.clip(self._synthesize_q(y_hat, 0), 0.0, 1.0), y_hat, drained

    def decode_begin(self, z_hat: jax.Array):
        """Fused hyper-synthesis + slice-0 params (one dispatch)."""
        latent_means, latent_scales = self._hyper_out(z_hat)
        mu0, scale0, _ = self._slice_mu_scale(0, latent_means, latent_scales, [])
        idx0 = gc_build_indexes(scale0, self._scale_table()).astype(jnp.uint8)
        return latent_means, latent_scales, mu0, idx0

    def decode_step(
        self,
        slice_index: int,
        symbols_prev: jax.Array,
        mu_prev: jax.Array,
        latent_means: jax.Array,
        latent_scales: jax.Array,
        support: Tuple[jax.Array, ...],
    ):
        """Fused (reconstruct slice i-1) + (params for slice i) — one
        dispatch per decoded slice instead of two."""
        i_prev = slice_index - 1
        y_hat_prev = symbols_prev.astype(jnp.float32) + mu_prev
        mean_support_prev = self._lrp_mean_support(i_prev, latent_means, support)
        y_hat_prev = y_hat_prev + self._lrp(i_prev, mean_support_prev, y_hat_prev)

        new_support = (list(support) + [y_hat_prev])[: self.max_support_slices]
        mu, scale, _ = self._slice_mu_scale(
            slice_index, latent_means, latent_scales, new_support
        )
        idx = gc_build_indexes(scale, self._scale_table()).astype(jnp.uint8)
        return y_hat_prev, mu, idx

    def decode_end(
        self,
        symbols: jax.Array,
        mu: jax.Array,
        latent_means: jax.Array,
        slices: Tuple[jax.Array, ...],
    ) -> Tuple[jax.Array, jax.Array]:
        """Fused final-slice reconstruction + synthesis (one dispatch)."""
        i = self.num_slices - 1
        support = list(slices)[: self.max_support_slices]
        y_hat_last = symbols.astype(jnp.float32) + mu
        mean_support = self._lrp_mean_support(i, latent_means, support)
        y_hat_last = y_hat_last + self._lrp(i, mean_support, y_hat_last)
        y_hat = jnp.concatenate(list(slices) + [y_hat_last], axis=-1)
        return jnp.clip(self._synthesize_q(y_hat, 0), 0.0, 1.0), y_hat

    def _synthesize_q(self, y_hat: jax.Array, q) -> jax.Array:
        """Decoder-selection hook (scalable multiple_decoder overrides)."""
        return self._seq(self.g_s, y_hat)

    # ---------------- decoder device programs ----------------

    def hyper_synthesis(self, z_hat: jax.Array) -> Tuple[jax.Array, jax.Array]:
        return self._hyper_out(z_hat)

    def slice_params(
        self,
        slice_index: int,
        latent_means: jax.Array,
        latent_scales: jax.Array,
        support: Tuple[jax.Array, ...],
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """(mu, scale, indexes) for one slice given decoded support slices."""
        mu, scale, _ = self._slice_mu_scale(
            slice_index, latent_means, latent_scales, list(support)
        )
        indexes = gc_build_indexes(scale, self._scale_table())
        return mu, scale, indexes

    def slice_reconstruct(
        self,
        slice_index: int,
        symbols: jax.Array,
        mu: jax.Array,
        latent_means: jax.Array,
        support: Tuple[jax.Array, ...],
    ) -> jax.Array:
        """Dequantize one slice and apply latent residual prediction."""
        y_hat_slice = symbols.astype(jnp.float32) + mu
        mean_support = self._lrp_mean_support(slice_index, latent_means, support)
        return y_hat_slice + self._lrp(slice_index, mean_support, y_hat_slice)

    def synthesize(self, y_hat: jax.Array) -> jax.Array:
        return jnp.clip(self._seq(self.g_s, y_hat), 0.0, 1.0)
