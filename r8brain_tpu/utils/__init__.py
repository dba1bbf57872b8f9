"""Host-side analysis utilities (FIR response, scanners, math, tracing)."""
