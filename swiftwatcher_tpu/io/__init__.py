"""Host-side I/O: frame sources, window streaming, results export."""
