package graft.core

/** Config-time validators (utilities/validator.py:1-24): the reference
  * rejects malformed urlset URLs at config load
  * (configuration_loader.py:344) and malformed responsible emails at
  * Wrike dispatch (service/api/wrike.py:89). Same regex semantics,
  * anchored, case-insensitive. */
object Validation {

  private val UrlRe = (
    "^(?i)(?:http)s?://" +
      "(?:(?:[A-Z0-9](?:[A-Z0-9-]{0,61}[A-Z0-9])?\\.)+(?:[A-Z]{2,6}\\.?|[A-Z0-9-]{2,}\\.?)|" +
      "localhost|" +
      "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3})" +
      "(?::\\d+)?" +
      "(?:/?|[/?]\\S+)$").r

  private val EmailRe =
    "^(?i)[a-zA-Z0-9_.+-]+@[a-zA-Z0-9-]+\\.[a-zA-Z0-9-.]+$".r

  def validUrl(url: String): Boolean =
    url != null && UrlRe.findFirstIn(url).isDefined

  def validEmail(email: String): Boolean =
    email != null && EmailRe.findFirstIn(email).isDefined
}
