package graft.core

/** Spherical-earth distance with the reference's exact constants:
  * radius 3958.75 miles, 1609.0 meters/mile
  * (/root/reference/src/extensions/specialmeasures/geographical.h:3-23,
  * string_constants.h:11). Kept bit-identical for parity. */
object Geo {
  val EarthRadiusMiles = 3958.75
  val MetersPerMile = 1609.0

  def haversineMiles(lon1: Double, lat1: Double,
                     lon2: Double, lat2: Double): Double = {
    val la1 = math.toRadians(lat1); val la2 = math.toRadians(lat2)
    val dLat = la2 - la1
    val dLon = math.toRadians(lon2 - lon1)
    val h = math.pow(math.sin(dLat / 2), 2) +
      math.cos(la1) * math.cos(la2) * math.pow(math.sin(dLon / 2), 2)
    EarthRadiusMiles * 2 * math.asin(math.sqrt(h))
  }

  def haversineMeters(lon1: Double, lat1: Double,
                      lon2: Double, lat2: Double): Double =
    haversineMiles(lon1, lat1, lon2, lat2) * MetersPerMile
}
