"""Accuracy-evaluation harnesses (AUC parity across quantization flavors)."""
