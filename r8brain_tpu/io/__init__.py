"""I/O: WAV file read/write (io.wavio)."""
