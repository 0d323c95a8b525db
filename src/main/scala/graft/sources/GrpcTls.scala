package graft.sources

import java.io.FileInputStream
import java.security.KeyStore
import javax.net.ssl.{KeyManagerFactory, SSLContext, TrustManagerFactory}

/** TLS plumbing for [[GrpcEventServer]]/[[GrpcEventClient]]: build
  * SSLContexts from a PKCS12 keystore so the gRPC transport runs in
  * its credentials-bearing mode — TLS with ALPN "h2" (RFC 7301), the
  * negotiation a stock `grpc.Dial` with transport credentials
  * performs. ALPN itself is configured where the sockets are created
  * (JDK `SSLParameters.setApplicationProtocols`); this object only
  * owns key material.
  *
  * `selfSigned` shells out to the JDK's own keytool for a throwaway
  * cert — deployments bring their real keystore instead.
  */
object GrpcTls {

  /** Server context: private key + cert chain from a PKCS12 keystore. */
  def serverContext(keystorePath: String, password: String): SSLContext = {
    val ks = KeyStore.getInstance("PKCS12")
    val in = new FileInputStream(keystorePath)
    try ks.load(in, password.toCharArray) finally in.close()
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, password.toCharArray)
    val ctx = SSLContext.getInstance("TLSv1.3")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx
  }

  /** Client context trusting the certs IN that keystore (a pinned
    * self-signed peer or a private CA bundle).
    */
  def clientContext(keystorePath: String, password: String): SSLContext = {
    val ks = KeyStore.getInstance("PKCS12")
    val in = new FileInputStream(keystorePath)
    try ks.load(in, password.toCharArray) finally in.close()
    val tmf = TrustManagerFactory.getInstance(TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(ks)
    val ctx = SSLContext.getInstance("TLSv1.3")
    ctx.init(null, tmf.getTrustManagers, null)
    ctx
  }

  /** Generate a throwaway self-signed RSA cert for CN=localhost via
    * the JDK keytool; returns the keystore path. Test/dev helper.
    */
  def selfSigned(dir: String, password: String = "changeit"): String = {
    val path = new java.io.File(dir, "graft-grpc.p12").getAbsolutePath
    val keytool = new java.io.File(
      sys.props("java.home"), "bin/keytool").getAbsolutePath
    val cmd = Array(keytool, "-genkeypair", "-alias", "graft",
      "-keyalg", "RSA", "-keysize", "2048", "-storetype", "PKCS12",
      "-keystore", path, "-storepass", password,
      "-dname", "CN=localhost", "-validity", "30")
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes())
    val code = p.waitFor()
    require(code == 0, s"keytool failed ($code): $out")
    path
  }
}
