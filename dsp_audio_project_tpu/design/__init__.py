"""Host-side float64 filter/coefficient design (trace-time)."""
