"""Native C++ host codec: correctness oracle, serial baseline, fast decoder."""
