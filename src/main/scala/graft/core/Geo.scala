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

  /** Earth radius in meters and meters per degree of latitude under the
    * reference's sphere (2πR/360 ≈ 111,195 m). */
  val EarthRadiusMeters: Double = EarthRadiusMiles * MetersPerMile
  val MetersPerLatDegree: Double = EarthRadiusMeters * math.Pi / 180.0

  /** Relative safety margin on the candidate-window bounds below: the
    * bounding inequalities are exact in real arithmetic; the margin
    * swallows FP evaluation slop (~1 ulp per op across <10 ops, so 1e-3
    * is orders of magnitude more than needed). Over-expansion only costs
    * a few extra candidates — the exact refine decides membership. */
  val BoundSafety: Double = 1.001

  /** Conservative latitude half-window: haversine(p1, p2) <= d implies
    * |lat1 - lat2| <= latDegrees(d). Proof: h >= sin²(Δφ/2), so
    * d = 2R·asin(√h) >= 2R·|Δφ/2| ... >= R·|Δφ_radians|. */
  def latDegrees(d: Double): Double = d / MetersPerLatDegree * BoundSafety

  /** Conservative longitude half-window around a point at latitude `lat`:
    * haversine(p1, p2) <= d implies |lon1 - lon2| <= lonDegrees(d, lat1)
    * (360 = no bound, near the poles). Proof: h >= cosφ1·cosφ2·sin²(Δλ/2)
    * with φ2 within latDegrees(d) of φ1, so cosφ1·cosφ2 >= cos²(φmax)
    * where φmax = min(90°, |φ1| + Δφmax); then
    * |sin(Δλ/2)| <= sin(d/2R)/cos(φmax). */
  def lonDegrees(d: Double, lat: Double): Double = {
    val phiMax = math.abs(lat) + latDegrees(d)
    if (phiMax >= 89.9) 360.0
    else {
      val s = math.sin(d / (2.0 * EarthRadiusMeters)) /
        math.cos(math.toRadians(phiMax))
      if (s >= 1.0) 360.0
      else math.toDegrees(2.0 * math.asin(s)) * BoundSafety
    }
  }
}
