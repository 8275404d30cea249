"""Trainer layer: jitted/pjit train steps + epoch drivers for the NeuS
geometry stage and the nfr_unit / vq_nfr / ref_nfr decomposition stages."""
