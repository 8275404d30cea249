"""Model layer: NeuS geometry (stage 1) and the nfr_unit / vq_nfr / ref_nfr
decomposition family (stage 2), all as functional params-pytree models."""
