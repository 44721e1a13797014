"""Scalar helper functions shared by oracle code and Spark UDFs."""
