"""Vectorized numpy kernels + pandas_udf wrappers (the engine's "MathTransform" layer)."""
