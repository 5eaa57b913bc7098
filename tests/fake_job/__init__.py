"""Runnable fake-job module for scheduler placement tests."""
