"""Native (C++) acceleration-structure builders, loaded via ctypes."""
