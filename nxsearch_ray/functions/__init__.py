"""Scalar / per-token functions: Unicode ops, tokenizer, filters, hashing."""
