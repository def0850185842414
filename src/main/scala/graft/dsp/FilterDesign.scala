package graft.dsp

/** IIR filter design (G1, jagular/filtering.py:17-101): Butterworth and
  * Chebyshev-II designs producing second-order sections, plus the
  * reference's band-edge derivation rules. Pure driver-side math (the
  * distributed kernel only ever sees SOS coefficients), ported from the
  * standard textbook formulas (analog prototype → band transform →
  * bilinear), NOT from any library source.
  *
  * Conventions follow the common scipy-style API the reference drives:
  * normalized frequencies in (0, 1) where 1 = Nyquist.
  */
object FilterDesign {

  /** One biquad, a0 normalized to 1. */
  final case class Biquad(b0: Double, b1: Double, b2: Double, a1: Double, a2: Double)

  type Sos = Array[Biquad]

  // ------------------------------------------------------------- complex
  private final case class C(re: Double, im: Double) {
    def +(o: C) = C(re + o.re, im + o.im)
    def -(o: C) = C(re - o.re, im - o.im)
    def *(o: C) = C(re * o.re - im * o.im, re * o.im + im * o.re)
    def /(o: C) = {
      val d = o.re * o.re + o.im * o.im
      C((re * o.re + im * o.im) / d, (im * o.re - re * o.im) / d)
    }
    def *(s: Double) = C(re * s, im * s)
    def abs2: Double = re * re + im * im
    def conj: C = C(re, -im)
  }
  private object C {
    val one = C(1, 0)
    def real(x: Double) = C(x, 0)
  }

  /** Zeros/poles/gain representation of an ANALOG prototype. */
  private final case class Zpk(z: Vector[C], p: Vector[C], k: Double)

  // --------------------------------------------------- analog prototypes

  /** Butterworth analog lowpass prototype: poles on the unit circle. */
  private def butterAp(n: Int): Zpk = {
    val poles = (0 until n).map { k =>
      val theta = math.Pi * (2.0 * k + 1.0) / (2.0 * n) + math.Pi / 2.0
      C(math.cos(theta), math.sin(theta))
    }.toVector
    Zpk(Vector.empty, poles, 1.0)
  }

  /** Chebyshev type-II (inverse Chebyshev) analog lowpass prototype with
    * stopband ripple `rs` dB. Zeros on the imaginary axis at 1/cos(...),
    * poles are inverted type-I poles. */
  private def cheb2Ap(n: Int, rs: Double): Zpk = {
    val de = 1.0 / math.sqrt(math.pow(10.0, 0.1 * rs) - 1.0)
    val mu = asinh(1.0 / de) / n
    // zeros: conjugate pairs at ±j/cos(θk); odd n skips the middle (∞)
    val zs = (0 until n).flatMap { k =>
      val theta = math.Pi * (2.0 * k + 1.0) / (2.0 * n)
      val c = math.cos(theta)
      if (math.abs(c) < 1e-15) None
      else Some(C(0.0, -1.0 / c))
    }.toVector
    val ps = (0 until n).map { k =>
      val theta = math.Pi * (2.0 * k + 1.0) / (2.0 * n) + math.Pi / 2.0
      // type-I pole
      val p1 = C(math.sinh(mu) * math.cos(theta), math.cosh(mu) * math.sin(theta))
      C.one / p1 // inverted
    }.toVector
    // gain: H(0) = 1 → k = Π(-p) / Π(-z) (real by conjugate symmetry)
    val num = ps.foldLeft(C.one)((acc, p) => acc * (C.real(0) - p))
    val den = zs.foldLeft(C.one)((acc, z) => acc * (C.real(0) - z))
    Zpk(zs, ps, (num / den).re)
  }

  private def asinh(x: Double): Double = math.log(x + math.sqrt(x * x + 1.0))
  private def acosh(x: Double): Double = math.log(x + math.sqrt(x * x - 1.0))

  // ------------------------------------------------- frequency transforms

  private def lp2lp(z: Zpk, wo: Double): Zpk = {
    val degree = z.p.length - z.z.length
    Zpk(z.z.map(_ * wo), z.p.map(_ * wo), z.k * math.pow(wo, degree))
  }

  private def lp2hp(zpk: Zpk, wo: Double): Zpk = {
    val degree = zpk.p.length - zpk.z.length
    val z2 = zpk.z.map(z => C.real(wo) / z) ++ Vector.fill(degree)(C.real(0))
    val p2 = zpk.p.map(p => C.real(wo) / p)
    // k2 = k * real(prod(-z)/prod(-p))
    val num = zpk.z.foldLeft(C.one)((acc, z) => acc * (C.real(0) - z))
    val den = zpk.p.foldLeft(C.one)((acc, p) => acc * (C.real(0) - p))
    Zpk(z2, p2, zpk.k * (num / den).re)
  }

  private def lp2bp(zpk: Zpk, wo: Double, bw: Double): Zpk = {
    val degree = zpk.p.length - zpk.z.length
    def transform(roots: Vector[C]): Vector[C] =
      roots.flatMap { r =>
        val s = r * (bw / 2.0)
        val disc = sqrtC(s * s - C.real(wo * wo))
        Vector(s + disc, s - disc)
      }
    val z2 = transform(zpk.z) ++ Vector.fill(degree)(C.real(0))
    val p2 = transform(zpk.p)
    Zpk(z2, p2, zpk.k * math.pow(bw, degree))
  }

  private def sqrtC(c: C): C = {
    val r = math.sqrt(math.hypot(c.re, c.im))
    val th = math.atan2(c.im, c.re) / 2.0
    C(r * math.cos(th), r * math.sin(th))
  }

  // ------------------------------------------------------------ bilinear

  /** Bilinear transform with fs = 2 (pre-warped inputs). */
  private def bilinear(zpk: Zpk, fs: Double = 2.0): Zpk = {
    val fs2 = C.real(2.0 * fs)
    val degree = zpk.p.length - zpk.z.length
    val zd = zpk.z.map(z => (fs2 + z) / (fs2 - z)) ++ Vector.fill(degree)(C.real(-1))
    val pd = zpk.p.map(p => (fs2 + p) / (fs2 - p))
    val num = zpk.z.foldLeft(C.one)((acc, z) => acc * (fs2 - z))
    val den = zpk.p.foldLeft(C.one)((acc, p) => acc * (fs2 - p))
    Zpk(zd, pd, zpk.k * (num / den).re)
  }

  // ------------------------------------------------------------ zpk→sos

  /** Pair conjugate roots into second-order sections. Roots come in
    * conjugate pairs (plus reals); greedy pairing: sort by |im| then
    * match conjugates, pair leftover reals together. */
  private def zpk2sos(zpk: Zpk): Sos = {
    def pairUp(roots: Vector[C]): Vector[(C, Option[C])] = {
      val (complex, real) = roots.partition(r => math.abs(r.im) > 1e-12)
      val conjPairs = complex
        .filter(_.im > 0)
        .sortBy(c => (c.re, c.im))
        .map(c => (c, Some(c.conj)))
      val realsSorted = real.sortBy(_.re)
      val realPairs = realsSorted
        .grouped(2)
        .map {
          case Vector(a, b) => (a, Some(b))
          case Vector(a) => (a, None)
          case _ => throw new IllegalStateException
        }
        .toVector
      conjPairs ++ realPairs
    }
    // pad zeros to even count handled by Option
    val zs = pairUp(zpk.z)
    val ps = pairUp(zpk.p)
    require(zs.length <= ps.length, "more zero sections than pole sections")
    val nSections = ps.length
    val sections = (0 until nSections).map { i =>
      val (p1, p2) = ps(i)
      // den: (x - p1)(x - p2)
      val (a1, a2) = p2 match {
        case Some(q) => (-(p1 + q).re, (p1 * q).re)
        case None => (-p1.re, 0.0)
      }
      val (b0, b1, b2) = if (i < zs.length) {
        val (z1, z2) = zs(i)
        z2 match {
          case Some(q) => (1.0, -(z1 + q).re, (z1 * q).re)
          case None => (1.0, -z1.re, 0.0)
        }
      } else (1.0, 0.0, 0.0)
      Biquad(b0, b1, b2, a1, a2)
    }.toArray
    // apply overall gain to the first section
    if (sections.nonEmpty) {
      val h = sections.head
      sections(0) = Biquad(h.b0 * zpk.k, h.b1 * zpk.k, h.b2 * zpk.k, h.a1, h.a2)
    }
    sections
  }

  // --------------------------------------------------------------- public

  sealed trait BandType
  case object Lowpass extends BandType
  case object Highpass extends BandType
  /** (low, high) normalized corner pair. */
  case object Bandpass extends BandType

  /** Digital IIR design: `wn` normalized corners (1 = Nyquist). */
  def butter(order: Int, wn: Seq[Double], btype: BandType): Sos =
    designDigital(butterAp(order), wn, btype)

  def cheby2(order: Int, rs: Double, wn: Seq[Double], btype: BandType): Sos =
    designDigital(cheb2Ap(order, rs), wn, btype)

  private def designDigital(proto: Zpk, wn: Seq[Double], btype: BandType): Sos = {
    require(wn.forall(w => w > 0 && w < 1), s"normalized corners must be in (0,1): $wn")
    val fs = 2.0
    val warped = wn.map(w => 2.0 * fs * math.tan(math.Pi * w / fs))
    val analog = btype match {
      case Lowpass => lp2lp(proto, warped.head)
      case Highpass => lp2hp(proto, warped.head)
      case Bandpass =>
        val Seq(lo, hi) = warped.toSeq
        lp2bp(proto, math.sqrt(lo * hi), hi - lo)
    }
    zpk2sos(bilinear(analog, fs))
  }

  /** Chebyshev-II minimum order estimate (cheb2ord): smallest n with
    * stopband attenuation ≥ gstop at ws and passband loss ≤ gpass at wp
    * (lowpass-normalized selectivity). */
  def cheb2Order(wp: Double, ws: Double, gpass: Double, gstop: Double): Int = {
    // lowpass: nat = ws/wp; highpass: wp/ws — caller passes the ratio >1
    val nat = math.max(ws / wp, wp / ws)
    val gp = math.pow(10.0, 0.1 * gpass) - 1.0
    val gs = math.pow(10.0, 0.1 * gstop) - 1.0
    val n = acosh(math.sqrt(gs / gp)) / acosh(nat)
    math.max(1, math.ceil(n - 1e-12).toInt)
  }

  /** The reference's band-edge rules + cheby2 design in one call
    * (jagular/filtering.py:66-101): lowpass `wp=fh/(fs/2), ws=1.4*wp`;
    * highpass `wp=fl/(fs/2), ws=0.8*wp`; bandpass both; all-pass
    * rejected. Returns SOS for the sosfiltfilt kernel. */
  def iirdesignCheby2(
      fs: Double,
      fl: Option[Double],
      fh: Option[Double],
      gpass: Double = 0.1,
      gstop: Double = 30.0
  ): Sos = {
    val nyq = fs / 2.0
    (fl, fh) match {
      case (None, Some(h)) => // lowpass
        val wp = h / nyq; val ws = 1.4 * wp
        val n = cheb2Order(wp, ws, gpass, gstop)
        cheby2(n, gstop, Seq(math.min(ws, 0.999)), Lowpass)
      case (Some(l), None) => // highpass
        val wp = l / nyq; val ws = 0.8 * wp
        val n = cheb2Order(wp, ws, gpass, gstop)
        cheby2(n, gstop, Seq(ws), Highpass)
      case (Some(l), Some(h)) => // bandpass
        val wpl = l / nyq; val wph = h / nyq
        val wsl = 0.8 * wpl; val wsh = math.min(1.4 * wph, 0.999)
        val n = math.max(
          cheb2Order(wpl, wsl, gpass, gstop),
          cheb2Order(wph, wsh, gpass, gstop)
        )
        cheby2(n, gstop, Seq(wsl, wsh), Bandpass)
      case (None, None) =>
        throw new IllegalArgumentException("all-pass filter requested (no corners)")
    }
  }

  /** |H(e^{jw})| at normalized frequency w (1 = Nyquist) — for tests and
    * design validation. */
  def gainAt(sos: Sos, w: Double): Double = {
    val z = C(math.cos(math.Pi * w), -math.sin(math.Pi * w)) // z^-1
    val h = sos.foldLeft(C.one) { (acc, s) =>
      val num = C.real(s.b0) + z * s.b1 + z * z * s.b2
      val den = C.one + z * s.a1 + z * z * s.a2
      acc * (num / den)
    }
    math.sqrt(h.abs2)
  }
}
