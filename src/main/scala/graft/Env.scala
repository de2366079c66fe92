package graft

/** Validated environment-lever parsing (ADVICE r15): a malformed or
  * non-positive value used to surface as an opaque
  * `ExceptionInInitializerError` at first class access (bare `.toInt`
  * in a `val` initializer), and a zero/negative cap silently emptied
  * every capped index. Every scale lever parses through here so the
  * failure names the variable and the rule it broke.
  */
object Env {

  /** Strictly-positive integer lever, `default` when unset. */
  def posInt(name: String, default: Int): Int =
    sys.env.get(name).map { v =>
      val n =
        try v.trim.toInt
        catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"$name must be a positive integer, got '$v'")
        }
      require(n > 0, s"$name must be a positive integer, got '$v'")
      n
    }.getOrElse(default)

  /** Strictly-positive long lever (byte thresholds), `default` when
    * unset. */
  def posLong(name: String, default: Long): Long =
    sys.env.get(name).map { v =>
      val n =
        try v.trim.toLong
        catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"$name must be a positive integer, got '$v'")
        }
      require(n > 0, s"$name must be a positive integer, got '$v'")
      n
    }.getOrElse(default)

  /** Tri-state boolean lever: "1" => Some(true), "0" => Some(false),
    * unset => None (caller decides, e.g. from measured stats). Any
    * other value is a loud error, not a silent `false`. */
  def triState(name: String): Option[Boolean] =
    sys.env.get(name).map {
      case "1" => true
      case "0" => false
      case v =>
        throw new IllegalArgumentException(
          s"$name must be '1' or '0' (or unset for auto), got '$v'")
    }
}
