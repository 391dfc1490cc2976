# Import-resolution stand-in for the NameAI `inspector` package (the
# interesting-score service; the measured stages never score).
