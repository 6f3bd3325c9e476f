"""Core world model: state PyTree, constants, grid ops, step/obs kernels."""
