"""Conditional-merge dual-decoder codec ("cimd").

Parity target: src/compress/models/WACNN/scalable/conditional_multiple_decoder.py
(conditional_scalable_imd, 396 LoC): cicd + two decoders where decoder 1's
input width doubles under the 'concatenation' joiner
(conditional_multiple_decoder.py:41-57, 243-247).
"""

from __future__ import annotations

from .conditional_single_decoder import ConditionalScalableICD


class ConditionalScalableIMD(ConditionalScalableICD):
    multiple_decoder: bool = True

    def _decoder_dim(self, decoder_index: int) -> int:
        if decoder_index == 1 and self.joiner_policy == "concatenation":
            return 2 * self.M
        return self.M
