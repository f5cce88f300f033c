"""Data ingestion: OpenPose json, windows, standardization, featurizers."""
