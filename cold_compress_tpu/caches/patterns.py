"""Per-layer cache length/strategy patterning.

Mirrors the reference's layer-pattern utilities
(reference: generation_utils.py:224-321): fraction→absolute normalization
rounded to a multiple of 8, tile/repeat extension, and PyramidKV-style
pyramid/funnel linear ramps.
"""

from __future__ import annotations

from typing import List, Sequence, Union

from ..models.config import find_multiple


def normalize_cache_length(
    max_cache_length: float, max_seq_length: int, multiple_of: int = 8
) -> int:
    """Fraction-or-absolute → absolute length, rounded up to a multiple of 8
    and clamped to ``max_seq_length`` (reference: generation_utils.py:260-276).
    """
    if 0 < max_cache_length <= 1:
        max_cache_length = round(max_seq_length * max_cache_length)
    else:
        assert int(max_cache_length) == max_cache_length
        max_cache_length = int(max_cache_length)
        if max_cache_length > max_seq_length:
            max_cache_length = max_seq_length
    return min(find_multiple(int(max_cache_length), multiple_of), max_seq_length)


def apply_pyramid_pattern(
    max_cache_length: int,
    max_seq_length: int,
    n_layer: int,
    decreasing: bool = True,
    min_cache_length: int = 256,
) -> List[int]:
    """PyramidKV (arXiv:2406.02069) linear ramp with beta=14 and min-length
    redistribution (reference: generation_utils.py:279-321). ``decreasing``
    gives the pyramid shape, otherwise the funnel."""
    beta = 14
    min_allowable = min(min_cache_length, max_cache_length)
    total_len = max_cache_length * n_layer
    lo = total_len / (n_layer * beta)
    hi = 2 * total_len / n_layer
    diff = (hi - lo) / n_layer
    lens = [lo] + [lo + diff * l for l in range(1, n_layer - 1)] + [hi]
    lens = [normalize_cache_length(int(l), max_seq_length) for l in lens]

    overflow = 0
    num_overflow = 0
    for i in range(len(lens)):
        if lens[i] < min_allowable:
            overflow += min_allowable - lens[i]
            lens[i] = min_allowable
            num_overflow += 1
    if num_overflow < len(lens):
        decr = overflow // (len(lens) - num_overflow)
        for i in range(len(lens)):
            if lens[i] > min_allowable:
                lens[i] = max(min_allowable, lens[i] - decr)

    if decreasing:
        lens = lens[::-1]
        assert lens[-1] < lens[0], "Cache lengths should be decreasing."
    else:
        assert lens[0] < lens[-1], "Cache lengths should be increasing."
    return lens


def apply_pattern(
    pattern: Sequence[Union[str, int]],
    out_size: int,
    extension_strategy: str = "tile",
    max_seq_length: int = None,
) -> list:
    """Extend a per-layer pattern across all layers
    (reference: generation_utils.py:224-257)."""
    assert extension_strategy in {"tile", "repeat", "pyramid", "funnel"}
    assert out_size % len(pattern) == 0, (
        f"{len(pattern)} must divide the number of layers ({out_size})."
    )
    factor = out_size // len(pattern)
    if extension_strategy in {"funnel", "pyramid"}:
        assert len(pattern) == 1, (
            "Funnel and pyramid patterns must have a single element."
        )
        return apply_pyramid_pattern(
            pattern[0],
            max_seq_length,
            out_size,
            decreasing=extension_strategy == "pyramid",
        )
    if extension_strategy == "tile":
        return [item for item in pattern for _ in range(factor)]
    return list(pattern) * factor
