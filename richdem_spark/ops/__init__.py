"""Spark operators: DataFrame -> DataFrame transforms composing the NumPy
kernels via Arrow-batched pandas UDFs (mapInPandas), per the input_hint's
"no per-row Python" rule."""
