"""Standalone evaluation CLIs: ATE, 3D/2D reconstruction metrics, mesh culling."""
