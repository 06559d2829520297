SELECT COUNT(*) FROM so_user as u, badge as b
WHERE b.user_id = u.id AND b.site_id = u.site_id
  AND b.name IN ('Teacher','Editor') AND u.reputation >= 1000;
