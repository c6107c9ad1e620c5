from mcpt.pallas import megakernel  # noqa: F401
