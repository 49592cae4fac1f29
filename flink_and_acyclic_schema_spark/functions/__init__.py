"""Scalar/numeric helper functions shared by plans."""
