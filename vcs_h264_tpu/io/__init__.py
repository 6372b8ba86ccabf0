"""Host-side media + bitstream I/O."""
