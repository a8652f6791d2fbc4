"""placeholder — filled in as operators land."""
