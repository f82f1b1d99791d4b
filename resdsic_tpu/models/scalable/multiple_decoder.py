"""Scalable dual-decoder codec ("imd").

Parity target: src/compress/models/WACNN/scalable/multiple_decoder.py
(scalable_imd, 371 LoC): scalable_icd plus two full synthesis transforms —
g_s[0] for base-only reconstructions (q==0), g_s[1] for base+progressive.
"""

from __future__ import annotations

from .single_decoder import ScalableICD


class ScalableIMD(ScalableICD):
    multiple_decoder: bool = True
