"""Hand-written GEDCOM fixture exercising every extraction semantic
(FIXTURES.md §2c): pointer hoisting, EVEN promotion, name-split edge
cases, unknown tags, temple decode hit/miss, boolean encode, emission
guards, last-wins key collisions, id-less records.
"""

DEMO_GEDCOM = """\
0 HEAD
1 CHAR UTF-8
1 GEDC
2 VERS 5.5
0 @I1@ INDI
1 NAME John /Smith/ Jr.
1 SEX M
1 BIRT
2 DATE 1 JAN 1900
2 PLAC Boston
2 SOUR @S1@
1 _PRIMARY Y
1 _WEIRD stuff
1 FAMS @F1@
0 @I2@ INDI
1 NAME Mary
1 _PRIMARY
1 BAPL
2 DATE 2 FEB 1920
2 TEMP SLAKE
2 PLAC SLAKE
1 EVEN
2 TYPE Graduation
2 DATE 5 MAY 1925
1 FAMS @F1@
0 @I3@ INDI
1 NAME /Jones/
1 NAME Bobby
1 FAMC @F1@
0 @F1@ FAM
1 HUSB @I1@
1 WIFE @I2@
1 CHIL @I3@
1 MARR
2 DATE 3 MAR 1921
2 TEMP XXXXX
0 @X9@ FOO
1 NAME ghost
0 INDI
1 NOTE idless
1 ALIA @I1@
0 TRLR
"""
