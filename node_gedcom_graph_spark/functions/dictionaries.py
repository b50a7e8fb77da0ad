"""GEDCOM tag / LDS-temple lookup dictionaries (engine data tables).

Behavioral parity data with the reference's lookup tables
(/root/reference/const/tags.js:1-159 and /root/reference/const/temples.js:1-204
-- SURVEY.md section 2 ops 6, 10, 11). Stored as tab-separated text and
parsed at import; exposed both as plain dicts (for literal-map column
expressions) and as small DataFrames meant to be broadcast-joined
(`F.broadcast(tags_df(spark))`).

The GEDCOM tag vocabulary is the public GEDCOM 5.5 standard plus common
vendor underscore-tags; temple codes are the public LDS temple-code list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _parse(block: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for line in block.strip().splitlines():
        key, _, name = line.partition("\t")
        out[key] = name
    return out


# 131-entry GEDCOM tag -> display-name dictionary (25 vendor + 106 standard).
_TAGS_TSV = """\
_AKA	Also Known As
_APPLIES_TO	Applies To
_DATE_TYPE	Type of Date
_DESC_FLAG	Show Description
_EMAIL	Email Address
_EVENT_DEFN	Event Definition
_FSFTID	Family Search Family Tree ID
_ITALIC	Print in Italics
_LDS	Is LDS
_MARNM	Married Name
_MASTER	In Master Listing
_NAME	Name
_NONE	No Children
_PAREN	Print in Parentheses
_PLACE_TYPE	Type of Place
_PRIM	Primary Object is Multimedia
_PRIMARY	Primary
_RIN	Record Identification Number
_ROTATE	Rotation Degrees
_SCBK	Scrapbook
_SENT	Sentence Template
_SSHOW	Slideshow
_STIME	Slideshow Length
_STAT	Status
_TYPE	File Type
_UID	Universally Unique ID
ABBR	Abbreviation
ADDR	Address
ADR1	Address Line 1
ADR2	Address Line 2
ADOP	Adoption
AFN	Ancestral File Number
AGE	Age
AGNC	Agency
ALIA	Alias
ANCE	Ancestors
ANCI	Ancestors of Interest
ANUL	Annulment
ASSO	Associates
AUTH	Author
BAPL	LDS Baptism
BAPM	Baptism
BARM	Bar Mitzvah
BASM	Bas Mitzvah
BIRT	Birth
BLES	Blessing
BLOB	Binary Large Object
BURI	Burial
CALN	Call Number
CAST	Caste
CAUS	Cause
CENS	Census
CHAN	Change
CHAR	Character
CHIL	Child
CHR	Child Christening
CHRA	Adult Christening
CITY	City
CONC	Concatenation
CONF	Confirmation
CONL	LDS Confirmation
CONT	Continued
COPR	Copyright
CORP	Corporate
CREM	Cremation
CTRY	Country
DATA	Data
DATE	Date
DEAT	Death
DESC	Descendants
DESI	Descendants of Interest
DEST	Destination
DIV	Divorce
DIVF	Divorce Filed
DSCR	Physical Description
EDUC	Education
EMIG	Emigration
ENDL	LDS Endowment
ENGA	Engagement
EVEN	Event
FAM	Family
FAMC	Child in Family
FAMF	Family File
FAMS	Spouse in Family
FCOM	First Communion
FILE	File
FORM	Format
GEDC	Gedcom
GIVN	Given Name
GRAD	Graduation
HEAD	Header
HUSB	Husband
IDNO	Identification Number
IMMI	Immigration
INDI	Individual
LANG	Language
LEGA	Legatee
MARB	Marriage Announcement
MARC	Marriage Contract
MARL	Marriage License
MARR	Marriage
MARS	Marriage Settlement
MEDI	Media
NAME	Name
NATI	Nationality
NATU	Naturalization
NCHI	Number of Children
NICK	Nickname
NMR	Number of Marriages
NOTE	Note
NPFX	Name Prefix
NSFX	Name Suffix
OBJE	Object
OCCU	Occupation
ORDI	Ordinanace
ORDN	Ordination
PAGE	Page
PEDI	Pedigree
PHON	Phone
PLAC	Place
POST	Postal Code
PROB	Probate
PROP	Property
PUBL	Publication
QUAY	Quality of Data
REFN	Reference
RELA	Relationship
RELI	Religion
REPO	Repository
RESI	Residence
RESN	Restriction
RETI	Retirement
RFN	Record File Number
RIN	Record Id Number
ROLE	Role
SEX	Sex
SLGC	Sealing to Parents
SLGS	Sealing to Spouse
SOUR	Source
SPFX	Surname Prefix
SSN	Social Security Number
STAE	State
STAT	US State
SUBM	Submitter
SUBN	Submission
SURN	Surname
TEMP	Temple
TEXT	Text
TIME	Time
TITL	Title
TRLR	Trailer
TYPE	Type
VERS	Version
WIFE	Wife
WILL	Will
"""

# 176-entry LDS temple-code -> temple-name dictionary.
_TEMPLES_TSV = """\
ABA	Aba Nigeria
ACCRA	Accra Ghana
ADELA	Adelaide Australia
ALBER	Cardston Alberta
AL	Cardston Alberta
ALBUQ	Albuquerque New Mexico
ANCHO	Anchorage Alaska
APIA	Apia Samoa
AP	Apia Samoa
ARIZO	Mesa Arizona
AZ	Mesa Arizona
ASUNC	Asunci\u00f3n Paraguay
ATLAN	Atlanta Georgia
AT	Atlanta Georgia
BAIRE	Buenos Aires Argentina
BA	Buenos Aires Argentina
BILLI	Billings Montana
BIRMI	Birmingham Alabama
BISMA	Bismarck North Dakota
BOGOT	Bogot\u00e1 Colombia
BG	Bogot\u00e1 Colombia
BOISE	Boise Idaho
BO	Boise Idaho
BOSTO	Boston Massachusetts
BOUNT	Bountiful Utah
BRIGH	Brigham City Utah
BRISB	Brisbane Australia
BROUG	Baton Rouge Louisiana
CALGA	Calgary Alberta
CAMPI	Campinas Brazil
CARAC	Caracas Venezuela
CEBUP	Cebu Philippines
CHICA	Chicago Illinois
CH	Chicago Illinois
CIUJU	Ciudad Ju\u00e1rez M\u00e9xico
COCHA	Cochabamba Bolivia
COLJU	Colonia Ju\u00e1rez Chihuahua M\u00e9xico
COLSC	Columbia South Carolina
COLUM	Columbus Ohio
COPEN	Copenhagen Denmark
CORDO	Cordoba Argentina
CRIVE	Columbia River Washington
CURIT	Curitiba Brazil
DALLA	Dallas Texas
DA	Dallas Texas
DENVE	Denver Colorado
DV	Denver Colorado
DETRO	Detroit Michigan
DRAPE	Draper Utah
EDMON	Edmonton Alberta
EHOUS	Endowment House
EH	Endowment House
FORTL	Fort Lauderdale Florida
FRANK	Frankfurt Germany
FR	Frankfurt Germany
FREIB	Freiberg Germany
FD	Freiberg Germany
FRESN	Fresno California
FUKUO	Fukuoka Japan
GILAV	The Gila Valley Arizona
GILBE	Gilbert Arizona
GUADA	Guadalajara M\u00e9xico
GUATE	Guatemala City Guatemala
GA	Guatemala City Guatemala
GUAYA	Guayaquil Ecuador
GY	Guayaquil Ecuador
HAGUE	The Hague Netherlands
HALIF	Halifax Nova Scotia
HAWAI	Laie Hawaii
HA	Laie Hawaii
HELSI	Helsinki Finland
HERMO	Hermosillo Sonora M\u00e9xico
HKONG	Hong Kong China
HOUST	Houston Texas
IFALL	Idaho Falls Idaho
IF	Idaho Falls Idaho
INDIA	Indianapolis Indiana
JOHAN	Johannesburg South Africa
JO	Johannesburg South Africa
JRIVE	Jordan River Utah
JR	Jordan River Utah
KANSA	Kansas City Missouri
KONA	Kona Hawaii
KYIV	Kyiv Ukraine
LANGE	Los Angeles California
LA	Los Angeles California
LIMA	Lima Peru
LI	Lima Peru
LOGAN	Logan Utah
LG	Logan Utah
LONDO	London England
LD	London England
LOUIS	Louisville Kentucky
LUBBO	Lubbock Texas
LVEGA	Las Vegas Nevada
LV	Las Vegas Nevada
MADRI	Madrid Spain
MANAU	Manaus Brazil
MANHA	Manhattan New York
MANIL	Manila Philippines
MA	Manila Philippines
MANTI	Manti Utah
MT	Manti Utah
MEDFO	Medford Oregon
MELBO	Melbourne Australia
MEMPH	Memphis Tennessee
MERID	M\u00e9rida M\u00e9xico
MEXIC	M\u00e9xico City M\u00e9xico
MX	M\u00e9xico City M\u00e9xico
MNTVD	Montevideo Uruguay
MONTE	Monterrey M\u00e9xico
MONTI	Monticello Utah
MONTR	Montr\u00e9al Qu\u00e9bec
MITMP	Mount Timpanogos Utah
MTIMP	Mount Timpanogos Utah
NASHV	Nashville Tennessee
NAUV	Nauvoo Illinois
NAUV2	Nauvoo Illinois
NAUVO	Nauvoo Illinois
NBEAC	Newport Beach California
NUKUA	Nuku
TG	Nuku
NZEAL	Hamilton New Zealand
NZ	Hamilton New Zealand
OAKLA	Oakland California
OK	Oakland California
OAXAC	Oaxaca M\u00e9xico
OGDEN	Ogden Utah
OG	Ogden Utah
OKLAH	Oklahoma City Oklahoma
OQUIR	Oquirrh Mountain Utah
ORLAN	Orlando Florida
OTHER	Unknown Temple
PALEG	Porto Alegre Brazil
PALMY	Palmyra New York
PANAM	Panam\u00e1 City Panam\u00e1
PAPEE	Papeete Tahiti
TA	Papeete Tahiti
PERTH	Perth Australia
PHOEN	Phoenix Arizona
POFFI	President
PORTL	Portland Oregon
PT	Portland Oregon
PREST	Preston England
PROVO	Provo Utah
PV	Provo Utah
QUETZ	Quetzaltenango Guatemala
RALEI	Raleigh North Carolina
RECIF	Recife Brazil
REDLA	Redlands California
REGIN	Regina Saskatchewan
RENO	Reno Nevada
REXBU	Rexburg Idaho
SACRA	Sacramento California
SANSA	San Salvador El Salvador
SANTI	Santiago Chile
SN	Santiago Chile
SANTO	San Antonio Texas
SDIEG	San Diego California
SA	San Diego California
SDOMI	Santo Domingo Dominican Republic
SEATT	Seattle Washington
SE	Seattle Washington
SEOUL	Seoul Korea
SO	Seoul Korea
SGEOR	St. George Utah
SG	St. George Utah
SJOSE	San Jos\u00e9 Costa Rica
SLAKE	Salt Lake City Utah
SL	Salt Lake City Utah
SLOUI	St. Louis Missouri
SNOWF	Snowflake Arizona
SPAUL	S\u00e3o Paulo Brazil
SP	S\u00e3o Paulo Brazil
SPMIN	St. Paul Minnesota
SPOKA	Spokane Washington
STOCK	Stockholm Sweden
ST	Stockholm Sweden
SUVA	Suva Fiji
SWISS	Bern Switzerland
SW	Bern Switzerland
SYDNE	Sydney Australia
SD	Sydney Australia
TAIPE	Taipei Taiwan
TP	Taipei Taiwan
TAMPI	Tampico M\u00e9xico
TEGUC	Tegucigalpa Honduras
TGUTI	Tuxtla Guti\u00e9rrez M\u00e9xico
TOKYO	Tokyo Japan
TK	Tokyo Japan
TORON	Toronto Ontario
TR	Toronto Ontario
TRUJI	Trujillo Peru
TWINF	Twin Falls Idaho
VANCO	Vancouver British Columbia
VERAC	Veracruz M\u00e9xico
VERNA	Vernal Utah
VILLA	Villahermosa M\u00e9xico
WASHI	Washington D.C.
WA	Washington D.C.
WINTE	Winter Quarters
"""

GEDCOM_TAGS: dict[str, str] = _parse(_TAGS_TSV)
TEMPLE_CODES: dict[str, str] = _parse(_TEMPLES_TSV)

# The 8 vendor flag tags whose values are re-encoded as 'True'/'False'
# (reference lib/csv_writer.js:40-47).
BOOLEAN_TAGS: tuple[str, ...] = (
    "_DESC_FLAG", "_ITALIC", "_LDS", "_MASTER",
    "_NONE", "_PAREN", "_PRIM", "_PRIMARY",
)


def tags_df(spark: SparkSession) -> DataFrame:
    """Tag dictionary as a 131-row DataFrame (tag, tag_name) — broadcast it."""
    return spark.createDataFrame(list(GEDCOM_TAGS.items()), "tag string, tag_name string")


def temples_df(spark: SparkSession) -> DataFrame:
    """Temple dictionary as a 176-row DataFrame (code, temple_name) — broadcast it."""
    return spark.createDataFrame(list(TEMPLE_CODES.items()), "code string, temple_name string")
