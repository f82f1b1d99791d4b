"""StreamingCodec: overlapped encode/decode worker pipeline.

The channel-autoregressive decoder necessarily alternates device programs
with host rANS; during its host phases the accelerator idles. Running
encode and decode of *different batches* concurrently fills those gaps:
encode is device/link-bound, decode is host-phase-bound, and the jitted
programs are thread-safe (the ctypes rANS calls release the GIL).

This is the production serving shape measured by bench.py: ~3× the
sequential enc+dec latency in steady-state throughput on a tunneled v5e.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Dict, Iterable, Iterator, List, Optional


class StreamingCodec:
    """Pump batches through compress→decompress with worker overlap.

    codec: a WACNNCodec/ScalableCodec (update() already called).
    """

    def __init__(
        self,
        codec,
        n_encode_workers: int = 2,
        n_decode_workers: int = 3,
        quality=None,
        max_inflight: int = 3,
        coded: bool = False,
    ):
        self.codec = codec
        self.n_enc = n_encode_workers
        self.n_dec = n_decode_workers
        self.quality = quality
        self.max_inflight = max_inflight
        # coded=True routes through the on-device-coded single-dispatch
        # paths (codec.compress_coded/decompress_coded) when the codec has
        # them — the serving-optimal configuration on link-limited hosts
        if coded and not hasattr(codec, "compress_coded"):
            raise ValueError(f"{type(codec).__name__} has no coded path")
        self._compress = codec.compress_coded if coded else codec.compress
        self._decompress = (
            codec.decompress_coded if coded else codec.decompress
        )

    def _kwargs(self):
        if self.quality is None:
            return {}
        return {"quality": self.quality}

    def map(
        self,
        batches: Iterable,
        on_result: Optional[Callable[[int, Dict[str, Any]], None]] = None,
    ) -> List[Dict[str, Any]]:
        """Compress+decompress every batch; returns per-batch dicts with
        'strings', 'shape', 'x_hat' in input order."""
        batches = list(batches)
        n = len(batches)
        results: List[Optional[dict]] = [None] * n

        enc_q: queue.Queue = queue.Queue()
        for i in range(n):
            enc_q.put(i)
        mid_q: queue.Queue = queue.Queue(maxsize=self.max_inflight)
        errors: List[BaseException] = []

        def encoder():
            while not errors:
                try:
                    i = enc_q.get_nowait()
                except queue.Empty:
                    return
                try:
                    out = self._compress(batches[i], **self._kwargs())
                except BaseException as e:  # surface to caller
                    errors.append(e)
                    return
                # bounded put with error polling: if every decode worker has
                # died while the queue is full, a bare put() would block
                # forever and map() would never raise
                while True:
                    try:
                        mid_q.put((i, out), timeout=0.2)
                        break
                    except queue.Full:
                        if errors:
                            return

        def decoder():
            while True:
                item = mid_q.get()
                if item is None:
                    return
                if errors:
                    continue  # drain without working; encoders stop on errors
                i, out = item
                try:
                    import numpy as _np

                    kw = self._kwargs()
                    if "coder" in out:  # host-path coder identity tag
                        kw["coder"] = out["coder"]
                    rec = self._decompress(out["strings"], out["shape"], **kw)
                    # tiny host fetch: the only reliable completion sync on
                    # tunneled backends (block_until_ready is a no-op there)
                    _np.asarray(rec["x_hat"][:1, :1, :1])
                except BaseException as e:
                    errors.append(e)
                    continue  # keep draining so encoders never jam
                results[i] = {**out, "x_hat": rec["x_hat"]}
                if on_result is not None:
                    on_result(i, results[i])

        enc_threads = [
            threading.Thread(target=encoder) for _ in range(self.n_enc)
        ]
        dec_threads = [
            threading.Thread(target=decoder) for _ in range(self.n_dec)
        ]
        for t in enc_threads + dec_threads:
            t.start()
        for t in enc_threads:
            t.join()
        for _ in range(self.n_dec):
            mid_q.put(None)
        for t in dec_threads:
            t.join()

        if errors:
            raise errors[0]
        return results  # type: ignore[return-value]

    def encode_stream(self, batches: Iterable) -> Iterator[Dict[str, Any]]:
        """Compress-only streaming (ordered)."""
        for b in batches:
            yield self._compress(b, **self._kwargs())
