"""IO: OBJ mesh loading, image IO helpers."""
