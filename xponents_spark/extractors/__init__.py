"""Extractor families: XCoord (coordinates), XTemporal (dates), PoLi
(patterns-of-life).  Importing a module registers its family normalizers
with the FlexPat engine."""
