"""Model zoo: JAX implementations of the VLM families spacer_tpu trains."""
