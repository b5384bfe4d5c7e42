"""Model families: latent (chart WAE), diffusion (latent denoiser),
style (difficulty-conditioned prior), inference (composed pipeline)."""
