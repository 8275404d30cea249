"""Pipeline drivers: geometry-buffer extraction (gen_geo), 4-phase
decomposition inference (test), relighting, video, and editing."""
