"""Spark pipeline stages: synthesis → extraction → linking → CC → write."""
