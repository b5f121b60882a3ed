"""Denoiser models (L2): MDM V2 (gesture), MDM V1, upstream-style MDM for
text-to-motion / action-to-motion, and the classifier-free guidance wrapper."""
