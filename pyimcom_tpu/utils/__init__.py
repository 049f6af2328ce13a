"""Host-side utilities: moments, SCA footprints, overlap matrices."""
