"""Shared corpus-pipeline tuning constants.

A LEAF module (no imports from sibling llm modules, no registry
import) so that any llm module can read these at import time without
circular-import hazard: registry._register_modules imports every llm
module, and any of them can itself be mid-import when it triggers the
registry load — importing *names* from a sibling at module top would
then see a partially initialized module (the round-5 refinery hit
exactly this).
"""

from __future__ import annotations

#: length-band bounds: drop the shortest 5% and longest 5% of
#: documents (quality.length_band_filter and refinery)
BAND_LO_PCT = 0.05
BAND_HI_PCT = 0.95

#: refinery keep-threshold on the duplicate-bigram character fraction
#: (sf0.01 fixture: splits 395/500 — both ways)
MAX_DUP_2GRAM = 0.10
