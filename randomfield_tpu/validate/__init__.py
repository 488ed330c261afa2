"""Statistical validation: float64 oracle and field statistics estimators."""
