"""Host-side sequence indexes (CSFM FM-index for seed lookup)."""

from .csfm import CSFMIndex, CSLoc, suffix_array

__all__ = ["CSFMIndex", "CSLoc", "suffix_array"]
