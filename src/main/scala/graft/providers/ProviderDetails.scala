package graft.providers

/** Provider name constants and sub-provider identification data,
  * ported from the reference's public data dictionaries
  * (util/loader/provider_details.py:13-133). These are DATA, not
  * logic: each sub-provider key maps to the API-response values (unit
  * codes, NSIDs, data providers) that identify it, and the loader uses
  * them to stamp the `source` column at the database level
  * (util/loader/sql.py's update-source pass, mirrored by
  * graft.maintain.Maintenance).
  */
object ProviderDetails {

  val FlickrDefaultProvider = "flickr"
  val EuropeanaDefaultProvider = "europeana"
  val WikimediaDefaultProvider = "wikimedia"
  val SmithsonianDefaultProvider = "smithsonian"

  /** provider_details.py:36-54 — Flickr sub-providers by owner NSID. */
  val flickrSubProviders: Map[String, Set[String]] = Map(
    "nasa" -> Set(
      "24662369@N07", // NASA Goddard Photo and Video
      "35067687@N04", // NASA HQ PHOTO
      "29988733@N04", // NASA Johnson
      "28634332@N05", // NASA's Marshall Space Flight Center
      "108488366@N07", // NASAKennedy
      "136485307@N06"), // Apollo Image Gallery
    "bio_diversity" -> Set("61021753@N02"), // BioDivLibrary
    "spacex" -> Set("130608600@N05"), // Official SpaceX Photos
    "woc_tech" -> Set("136629440@N06")) // WOCinTech Chat

  /** provider_details.py:59-61 — Europeana sub-providers by
    * dataProvider value. */
  val europeanaSubProviders: Map[String, String] = Map(
    "wellcome_collection" -> "Wellcome Collection")

  val FinnishDefaultProvider = "finnish_museums"

  /** provider_details.py:28-33 — Finnish museum sub-providers by
    * building facet value. */
  val finnishSubProviders: Map[String, String] = Map(
    "national_museum_of_finland" -> "0/Suomen kansallismuseo/",
    "finnish_heritage_agency" -> "0/Museovirasto/",
    "finnish_satakunnan_museum" -> "0/SATMUSEO/",
    "finnish_military_museum" -> "0/SA-kuva/")

  /** provider_details.py:64-132 — Smithsonian sub-providers by museum
    * unit code. */
  val smithsonianSubProviders: Map[String, Set[String]] = Map(
    "smithsonian_national_museum_of_natural_history" -> Set(
      "NMNHANTHRO", "NMNHBIRDS", "NMNHBOTANY", "NMNHEDUCATION", "NMNHENTO",
      "NMNHFISHES", "NMNHHERPS", "NMNHINV", "NMNHMAMMALS", "NMNHMINSCI",
      "NMNHPALEO"),
    "smithsonian_anacostia_museum" -> Set("ACM"),
    "smithsonian_cooper_hewitt_museum" -> Set("CHNDM"),
    "smithsonian_field_book_project" -> Set("FBR"),
    "smithsonian_freer_gallery_of_art" -> Set("FSG"),
    "smithsonian_gardens" -> Set("HAC"),
    "smithsonian_hirshhorn_museum" -> Set("HMSG"),
    "smithsonian_anthropological_archives" -> Set("NAA"),
    "smithsonian_air_and_space_museum" -> Set("NASM"),
    "smithsonian_african_american_history_museum" -> Set("NMAAHC"),
    "smithsonian_american_history_museum" -> Set("NMAH"),
    "smithsonian_american_indian_museum" -> Set("NMAI"),
    "smithsonian_african_art_museum" -> Set("NMAfA"),
    "smithsonian_portrait_gallery" -> Set("NPG"),
    "smithsonian_postal_museum" -> Set("NPM"),
    "smithsonian_zoo_and_conservation" -> Set("NZP"),
    "smithsonian_american_art_museum" -> Set("SAAM"),
    "smithsonian_institution_archives" -> Set("SIA"),
    "smithsonian_libraries" -> Set("SIL"))

  /** Inverted (identifying value -> sub-provider) form, the shape the
    * source-update join consumes. */
  def invert(m: Map[String, Set[String]]): Map[String, String] =
    for ((sub, codes) <- m; c <- codes) yield c -> sub
}
