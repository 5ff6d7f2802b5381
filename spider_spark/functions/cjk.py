"""CJK codepoint classification.

Behavioral parity with the reference's Unicode-block membership test
(``SearchUtil.java:8-30``): a codepoint "is CJK" iff it falls in one of the
Java ``Character.UnicodeBlock`` ranges the reference enumerates.  The ranges
below are the published Unicode block ranges for those names (Unicode 6.x,
which Java 8+ uses for these stable blocks).

Note the reference's list includes KANNADA — almost certainly a historical
accident (Kannada is a South-Indian script, not CJK) — but we preserve the
behavior exactly, since tokenization output must match.
"""

from __future__ import annotations

import numpy as np

# (lo, hi) inclusive codepoint ranges, mirroring SearchUtil.java:10-29.
_CJK_RANGES: list[tuple[int, int]] = [
    (0x3300, 0x33FF),    # CJK_COMPATIBILITY
    (0xFE30, 0xFE4F),    # CJK_COMPATIBILITY_FORMS
    (0xF900, 0xFAFF),    # CJK_COMPATIBILITY_IDEOGRAPHS
    (0x2F800, 0x2FA1F),  # CJK_COMPATIBILITY_IDEOGRAPHS_SUPPLEMENT
    (0x2E80, 0x2EFF),    # CJK_RADICALS_SUPPLEMENT
    (0x3000, 0x303F),    # CJK_SYMBOLS_AND_PUNCTUATION
    (0x4E00, 0x9FFF),    # CJK_UNIFIED_IDEOGRAPHS
    (0x3400, 0x4DBF),    # CJK_UNIFIED_IDEOGRAPHS_EXTENSION_A
    (0x20000, 0x2A6DF),  # CJK_UNIFIED_IDEOGRAPHS_EXTENSION_B
    (0x3100, 0x312F),    # BOPOMOFO
    (0x31A0, 0x31BF),    # BOPOMOFO_EXTENDED
    (0x3130, 0x318F),    # HANGUL_COMPATIBILITY_JAMO
    (0x1100, 0x11FF),    # HANGUL_JAMO
    (0xAC00, 0xD7AF),    # HANGUL_SYLLABLES
    (0x3190, 0x319F),    # KANBUN
    (0x3040, 0x309F),    # HIRAGANA
    (0x2F00, 0x2FDF),    # KANGXI_RADICALS
    (0x0C80, 0x0CFF),    # KANNADA (sic — preserved from the reference)
    (0x30A0, 0x30FF),    # KATAKANA
    (0x31F0, 0x31FF),    # KATAKANA_PHONETIC_EXTENSIONS
]

# Sorted range starts/ends for a binary-search membership test — O(log n)
# per codepoint, and vectorizable with numpy.searchsorted for batch paths.
_STARTS = np.array(sorted(r[0] for r in _CJK_RANGES), dtype=np.int64)
_ENDS = np.array([e for _, e in sorted(_CJK_RANGES)], dtype=np.int64)


def is_cjk(codepoint: int) -> bool:
    """True iff the codepoint is in one of the reference's CJK blocks."""
    i = int(np.searchsorted(_STARTS, codepoint, side="right")) - 1
    return i >= 0 and codepoint <= int(_ENDS[i])


def is_cjk_array(codepoints: np.ndarray) -> np.ndarray:
    """Vectorized membership over an int array of codepoints."""
    idx = np.searchsorted(_STARTS, codepoints, side="right") - 1
    ok = idx >= 0
    out = np.zeros(len(codepoints), dtype=bool)
    valid = np.where(ok)[0]
    out[valid] = codepoints[valid] <= _ENDS[idx[valid]]
    return out
