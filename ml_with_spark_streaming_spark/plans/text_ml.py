"""Text-pipeline and ML-parity queries (filled in with the featurization
surface — see functions/text.py)."""

from __future__ import annotations
