"""Visualization: 3D skeleton GIFs, gradient-flow tracking."""
